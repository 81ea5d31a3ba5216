from .torch_to_jax import (
    canonicalize,
    convert_checkpoint,
    load_torch_checkpoint,
    merge_into,
    to_flax_params,
)

__all__ = [
    "canonicalize",
    "convert_checkpoint",
    "load_torch_checkpoint",
    "merge_into",
    "to_flax_params",
]
