"""CLI: ``python -m nomad_tpu --mode dir --nmr X --deg Y`` — mirrors the
reference click CLI (`/root/reference/src/nomad_audio/__main__.py:4-17`)."""

import click


@click.command()
@click.option("--mode", type=str, default="dir", help="Choose mode dir or csv")
@click.option("--nmr", type=str, help="Path to non-matching reference files")
@click.option("--deg", type=str, help="Path to test files")
@click.option(
    "--results_path",
    type=str,
    default=None,
    help=(
        "Output directory for the two score CSVs (per-file averages and the "
        "full per-NMR matrix). When omitted, a timestamped folder is created "
        "under ./results-csv."
    ),
)
@click.option(
    "--device",
    type=str,
    default=None,
    help="Specify device, tpu or cpu. Defaults to the jax default backend.",
)
def main(mode, nmr, deg, results_path, device):
    from .api import get_nomad

    nomad = get_nomad(device=device)
    nomad_avg, nomad_scores = nomad.predict(mode, nmr, deg, results_path)
    print("Nomad average scores, printing top 5 test files")
    print(nomad_avg.head())


if __name__ == "__main__":
    main()
