"""psl_splicesites: extract splicesites from PSL annotations (util/psl_splicesites.pl.in)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from ..utils import annot

    lines = sys.stdin if argv is None or not argv else open(argv[0])
    transcripts = annot.parse_psl(lines)
    fn = annot.splicesites_text
    sys.stdout.write(fn(transcripts))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
