"""Benchmark: GSNAP-style single-end 100bp alignment throughput (reads/s).

Workload: 8192 reads of 100 bp sampled from the chr17test fixture with
0-3 random mutations, half reverse-complemented — the same workload used
to measure the reference gsnap binary on this host's CPU:

    gsnap -D gdb -d chr17test -t 1 --format=sam bench.fq
    -> "Processed 8192 queries in 5.61 seconds (1460.25 queries/sec)"
    (8 threads: 1603 q/s; BASELINE_REF_QPS below)

Prints ONE JSON line {metric, value, unit, vs_baseline}.
"""

import json
import sys
import time

import numpy as np

BASELINE_REF_QPS = 1460.25  # reference gsnap, 1 thread, this workload
BATCH = 2048
NBATCHES = 4
L = 100


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gmap_gsnap_tpu.align import gsnap_se
    from gmap_gsnap_tpu.db import build, indexdb
    from gmap_gsnap_tpu.ops import genome as genome_ops

    g = build.load_genome_fasta(["/root/reference/tests/ss.chr17test"])
    genome = genome_ops.GenomeArrays.from_codes(g.codes, g.flags, g.chr_ends)
    offsets, positions = indexdb.build_index(g.codes, g.flags, g.chr_ends, 12, 3)
    index = gsnap_se.IndexArrays.from_host(offsets, positions, 12, 3)

    rng = np.random.default_rng(42)
    nreads = BATCH * NBATCHES
    lefts = rng.integers(0, len(g.codes) - L, nreads)
    codes = g.codes[lefts[:, None] + np.arange(L)[None, :]].copy()
    nmut = rng.integers(0, 4, nreads)
    for i in range(nreads):
        for _ in range(nmut[i]):
            codes[i, rng.integers(0, L)] = rng.integers(0, 4)
    rc = rng.random(nreads) < 0.5
    codes[rc] = (codes[rc, ::-1] ^ 3).astype(np.uint8)
    nflags = np.zeros((nreads, L), bool)
    lengths = np.full(nreads, L, np.int32)

    from gmap_gsnap_tpu.align import gsnap_gapped

    # full default-gsnap workload: substitutions + middle indels, the
    # same feature set the reference binary ran for BASELINE_REF_QPS
    params = gsnap_gapped.GappedParams()
    dev_batches = [
        (
            jnp.asarray(codes[i : i + BATCH]),
            jnp.asarray(nflags[i : i + BATCH]),
            jnp.asarray(lengths[i : i + BATCH]),
        )
        for i in range(0, nreads, BATCH)
    ]

    # warmup / compile
    out = gsnap_gapped.align_batch_gapped(genome, index, *dev_batches[0], params)
    jax.block_until_ready(out)

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        outs = [
            gsnap_gapped.align_batch_gapped(genome, index, *db, params)
            for db in dev_batches
        ]
        jax.block_until_ready(outs)
    dt = time.time() - t0
    qps = reps * nreads / dt

    mapped = int(np.asarray(outs[-1]["npaths"] > 0).sum())
    assert mapped > 0.95 * BATCH, f"only {mapped}/{BATCH} reads mapped"

    print(
        json.dumps(
            {
                "metric": "gsnap_se_100bp_reads_per_sec",
                "value": round(qps, 1),
                "unit": "reads/s",
                "vs_baseline": round(qps / BASELINE_REF_QPS, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
