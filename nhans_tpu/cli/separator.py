"""``nhans_separator`` — speech source separation CLI
(reference N_HANS___Source_Separation/apply.py:400-414, setup.py:47)."""

from nhans_tpu.cli._app import run


def main() -> None:
    run("separator")


if __name__ == "__main__":
    main()
