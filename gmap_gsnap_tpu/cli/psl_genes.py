"""psl_genes: extract a genes map from PSL annotations
(util/psl_genes.pl.in)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from ..utils import annot

    lines = sys.stdin if argv is None or not argv else open(argv[0])
    transcripts = annot.parse_psl(lines)
    sys.stdout.write(annot.genes_text(
        transcripts, min_exons=1))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
