"""CLI dispatcher: ``python -m nvbio_tpu <command> ...``."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="nvbio_tpu",
        description="TPU-native bioinformatics framework (nvbio capabilities)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    from nvbio_tpu.apps import (
        aln_diff_app,
        assemble_app,
        correct_app,
        extract_app,
        index_app,
        map_app,
        mem_app,
        server_app,
        setbwt_app,
        sort_app,
    )

    index_app.add_parser(sub)
    map_app.add_parser(sub)
    mem_app.add_parser(sub)
    aln_diff_app.add_parser(sub)
    assemble_app.add_parser(sub)
    correct_app.add_parser(sub)
    extract_app.add_parser(sub)
    server_app.add_parser(sub)
    setbwt_app.add_parser(sub)
    sort_app.add_parser(sub)

    args = parser.parse_args(argv)
    try:
        return args.func(args)
    except BrokenPipeError:
        return 0  # downstream pipe (head, etc.) closed early


if __name__ == "__main__":
    sys.exit(main())
