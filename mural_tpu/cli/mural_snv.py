"""mural_snv console entry (ref MuRaL/mural_snv.py)."""

import sys

from mural_tpu.cli.main import create_parser, main as _main


def create_snv_parser():
    return create_parser("snv")


def main(argv=None) -> int:
    return _main("snv", argv)


if __name__ == "__main__":
    sys.exit(main())
