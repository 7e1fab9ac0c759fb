"""``nhans_denoiser`` — denoising / selective noise suppression CLI
(reference N_HANS___Selective_Noise/apply.py:491-527, setup.py:45)."""

from nhans_tpu.cli._app import run


def main() -> None:
    run("denoiser")


if __name__ == "__main__":
    main()
