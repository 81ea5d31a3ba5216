"""Config-driven experiment dispatcher — equivalent of
`/root/reference/main.py:6-44`.

    python main.py --config_file nomad_tpu/configs/train_triplet.yaml

The YAML picks the training module (``training_script``) and the experiment
branch (``experiment_name``): Training -> training_loop; quality_nmr ->
eval_audio_quality; valid_rank -> eval_degr_level; intensity ->
eval_degradation_intensity; quality_fr -> eval_full_reference. Reference
module paths (``src.training.train_triplet``,
``src.nomad_audio.nomad_loss_test``) are mapped to ours for config-file
compatibility.
"""

import importlib
import sys

import click
import yaml

_SCRIPT_ALIASES = {
    "src.training.train_triplet": "nomad_tpu.training.triplet",
    "src.nomad_audio.nomad_loss_test": "nomad_tpu.training.se",
    "src.nomad_ar.nomad_score_test": "nomad_tpu.smoke",
    "src.nomad_audio.nomad_score_test": "nomad_tpu.smoke",
}


@click.command()
@click.option("--config_file", type=str)
def training(config_file):
    with open(config_file) as f:
        config = yaml.load(f, Loader=yaml.FullLoader)

    module_name = config.get("training_script", "nomad_tpu.training.triplet")
    module_name = _SCRIPT_ALIASES.get(module_name, module_name)
    module = importlib.import_module(module_name)

    experiment = config.get("experiment_name")

    if module_name == "nomad_tpu.training.se":
        se = module.SpeechEnhancement(config)
        se.training_loop()
        return
    if module_name == "nomad_tpu.smoke":
        module.run(config)
        return

    train_obj = module.Training(config_file)
    if experiment == "Training":
        train_obj.training_loop()
    elif experiment == "quality_nmr":
        train_obj.eval_audio_quality(config["nomad_model_path"])
    elif experiment == "valid_rank":
        train_obj.eval_degr_level(config["nomad_model_path"])
    elif experiment == "intensity":
        train_obj.eval_degradation_intensity(config["nomad_model_path"])
    elif experiment == "quality_fr":
        train_obj.eval_full_reference(config["nomad_model_path"])
    else:
        print(f"Unknown experiment_name {experiment!r}; nothing to run",
              file=sys.stderr)


if __name__ == "__main__":
    training()
