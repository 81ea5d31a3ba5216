"""nomad_tpu — TPU-native NOMAD: non-matching-reference speech quality
assessment and differentiable perceptual loss, rebuilt on jax/XLA/pallas.

Drop-in surface for the reference package (`alessandroragano/nomad`):

    from nomad_tpu import nomad            # lazy singleton (no import-time
    nomad.predict('dir', nmr_path, deg)    #  download — quirk Q1 fixed)
    nomad.forward(estimate, clean)         # differentiable loss

or the explicit API:

    from nomad_tpu.api import Nomad
    n = Nomad(weights_dir='pt-models')
"""

from . import io, models, ops

__version__ = "0.1.0"


def __getattr__(name):
    if name == "nomad":
        from .api import get_nomad

        return get_nomad()
    raise AttributeError(f"module 'nomad_tpu' has no attribute {name!r}")


__all__ = ["io", "models", "nomad", "ops"]
