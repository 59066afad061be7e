"""CLI mirroring the reference binary (reference op #28).

The reference CLI (/root/reference/src/hoshizora/cli.cpp:8-36) dispatches on
``argv[1]``: ``pagerank <file> [iters]`` prints one rank per line;
``clustering <file> [hint] [threshold]`` prints one cluster id per line.

Run locally::

    python -m hoshizora_spark.cli pagerank edges.txt 50

or on a cluster (north_rule packaging)::

    spark-submit --py-files hoshizora_spark.zip -m ... \
        cli.py pagerank hdfs://.../edges.txt 50
"""

from __future__ import annotations

import sys

from hoshizora_spark import compat


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("pagerank", "clustering"):
        print("usage: python -m hoshizora_spark.cli {pagerank|clustering} FILE [args...]",
              file=sys.stderr)
        return 2
    cmd, file_name = argv[0], argv[1]
    if cmd == "pagerank":
        iters = int(argv[2]) if len(argv) > 2 else 50
        for line in compat.pagerank(file_name, iters):
            print(line)
    else:
        hint = int(argv[2]) if len(argv) > 2 else 100
        threshold = float(argv[3]) if len(argv) > 3 else 3e-5
        for cid in compat.clustering(file_name, hint, threshold):
            print(cid)
    return 0


if __name__ == "__main__":
    sys.exit(main())
