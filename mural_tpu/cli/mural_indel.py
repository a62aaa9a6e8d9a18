"""mural_indel console entry (ref MuRaL/mural_indel.py)."""

import sys

from mural_tpu.cli.main import create_parser, main as _main


def create_indel_parser():
    return create_parser("indel")


def main(argv=None) -> int:
    return _main("indel", argv)


if __name__ == "__main__":
    sys.exit(main())
