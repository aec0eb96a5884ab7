"""Profile the end-to-end GSNAP paths on the attached device.

Reproduces bench.py's SE/PE workloads at reduced size and reports
per-phase timings: device dispatch/fetch, full-row subset fetches,
emission, rescue lanes, plus raw tunnel round-trip latency.
"""

import io
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from gmap_gsnap_tpu.align import runner as runner_mod
    from gmap_gsnap_tpu.db import build
    from gmap_gsnap_tpu.db.datadir import GenomeDB
    from gmap_gsnap_tpu.utils import jaxenv

    jaxenv.enable_compilation_cache()

    # raw round-trip latency
    x = jnp.zeros(8, jnp.int32)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(10):
        np.asarray(x + 1)
    rtt = (time.time() - t0) / 10
    print(f"device round-trip (tiny array): {rtt*1e3:.1f} ms")

    big = jnp.zeros((1 << 20,), jnp.uint8)  # 1 MB
    jax.block_until_ready(big)
    t0 = time.time()
    for _ in range(5):
        np.asarray(big)
    bw = 5 * (1 << 20) / (time.time() - t0) / 1e6
    print(f"device->host bandwidth (1MB): {bw:.1f} MB/s")

    tmp = tempfile.mkdtemp()
    dbdir = build.build_db(
        ["/root/reference/tests/ss.chr17test"], "chr17test", tmp, k=12)
    db = GenomeDB.open(dbdir, "chr17test")
    seq = db.genome_str

    L = 100
    NPAIRS = 1024
    BATCH = 256
    rng = np.random.default_rng(7)
    sys.path.insert(0, "/root/repo")
    import bench
    r5, r3 = bench.make_pe_workload(seq, NPAIRS, rng)
    recs5 = [runner_mod.Record(f"b{i}", f"b{i}", s, "I" * L)
             for i, s in enumerate(r5)]
    recs3 = [runner_mod.Record(f"b{i}", f"b{i}", s, "I" * L)
             for i, s in enumerate(r3)]
    runner = runner_mod.GsnapRunner(db)

    out = io.StringIO()
    t0 = time.time()
    runner.run_pe(recs5[:BATCH], recs3[:BATCH], out)
    print(f"PE warmup/compile: {time.time()-t0:.1f} s")
    t0 = time.time()
    out = io.StringIO()
    runner.run_pe(recs5, recs3, out, batch_size=BATCH)
    dt = time.time() - t0
    print(f"PE e2e: {NPAIRS/dt:.0f} pairs/s  ({dt:.2f} s total)")

    # SE
    code_of = np.zeros(256, np.uint8)
    for i, c in enumerate(b"ACGT"):
        code_of[c] = i
    gcodes = code_of[seq.ascii]
    rng = np.random.default_rng(42)
    NSE = 1024
    lefts = rng.integers(0, len(seq) - L, NSE)
    codes = gcodes[lefts[:, None] + np.arange(L)[None, :]].copy()
    nmut = rng.integers(0, 4, NSE)
    for i in range(NSE):
        for _ in range(nmut[i]):
            codes[i, rng.integers(0, L)] = rng.integers(0, 4)
    rc = rng.random(NSE) < 0.5
    codes[rc] = (codes[rc, ::-1] ^ 3).astype(np.uint8)
    lut = np.frombuffer(b"ACGT", np.uint8)
    se_recs = [
        runner_mod.Record(f"s{i}", f"s{i}", bytes(lut[row]).decode(), "I" * L)
        for i, row in enumerate(codes)
    ]
    out = io.StringIO()
    t0 = time.time()
    runner.run(se_recs[:BATCH], out)
    print(f"SE warmup/compile: {time.time()-t0:.1f} s")
    t0 = time.time()
    out = io.StringIO()
    runner.run(se_recs, out, batch_size=BATCH)
    dt = time.time() - t0
    print(f"SE e2e: {NSE/dt:.0f} reads/s  ({dt:.2f} s total)")

    # instrument one SE batch by hand
    chunk = se_recs[:BATCH]
    t0 = time.time(); disp = runner.dispatch_records(chunk)
    t_disp = time.time() - t0
    t0 = time.time(); res = runner.fetch_records(disp)
    t_fetch = time.time() - t0
    np_a = np.asarray(res["npaths"])[:len(chunk)]
    t0 = time.time()
    done_a = runner._se_done_level(chunk, res)
    t_done = time.time() - t0
    need_full = ((np_a == 0) | (np_a > runner_mod.PAIR_KTOP)
                 | (done_a >= runner.params.indel_penalty_end)
                 | (runner._known_sites is not None))
    nfull = int(need_full.sum())
    print(f"SE one batch: dispatch {t_disp*1e3:.0f} ms, fetch "
          f"{t_fetch*1e3:.0f} ms, done_level {t_done*1e3:.0f} ms, "
          f"need_full {nfull}/{len(chunk)}")
    full_rows = list(np.flatnonzero(need_full))
    t0 = time.time()
    sub = runner.fetch_record_rows(res, full_rows) if full_rows else None
    print(f"  full-row subset fetch ({len(full_rows)} rows): "
          f"{(time.time()-t0)*1e3:.0f} ms")
    fast_cand = [j for j in range(len(chunk))
                 if np_a[j] == 1 and not need_full[j]]
    t0 = time.time()
    ft = runner._se_sam_fast([chunk[j] for j in fast_cand], res, fast_cand)
    print(f"  fast emission ({len(fast_cand)} rows): "
          f"{(time.time()-t0)*1e3:.0f} ms")
    slow = [j for j in range(len(chunk)) if j not in ft]
    t0 = time.time()
    runner._gmap_collect = []
    runner._gmap_rows = set()
    runner._categories = {}
    runner._catkey = None
    for j in slow:
        runner._cat_row(j)
        if sub is not None and j in sub["row_of"]:
            rres, rrow = sub, sub["row_of"][j]
        else:
            rres, rrow = res, j
        runner.sam_records(chunk[j], rres, rrow,
                           int(rres["npaths"][rrow]), runner.params.maxpaths)
    print(f"  scalar emission ({len(slow)} rows): "
          f"{(time.time()-t0)*1e3:.0f} ms; gmap pending "
          f"{len(runner._gmap_collect or [])}")
    runner._gmap_collect = None

    # PE one batch instrumented
    c5 = recs5[:BATCH]
    c3i = [runner_mod.Record(r.label, r.header,
                             runner_mod.dna.revcomp_str(r.seq.upper()),
                             r.quality[::-1] if r.quality else r.quality)
           for r in recs3[:BATCH]]
    t0 = time.time(); disp = runner.dispatch_pairs(c5, c3i)
    t_disp = time.time() - t0
    t0 = time.time(); res = runner.fetch_pairs(disp)
    t_fetch = time.time() - t0
    npair_a = np.asarray(res["npairs"])
    conc_a = np.asarray(res["pair_concordant"], bool)
    need_full = (npair_a == 0) | ~conc_a | (npair_a > runner_mod.PAIR_KTOP)
    print(f"PE one batch: dispatch {t_disp*1e3:.0f} ms, fetch "
          f"{t_fetch*1e3:.0f} ms, need_full {int(need_full.sum())}/{BATCH}")
    full_rows = list(np.flatnonzero(need_full[:BATCH]))
    t0 = time.time()
    sub = runner.fetch_pair_rows(res, full_rows) if full_rows else None
    print(f"  full-row subset fetch ({len(full_rows)} rows): "
          f"{(time.time()-t0)*1e3:.0f} ms")
    fast_cand = [j for j in range(BATCH)
                 if npair_a[j] == 1 and conc_a[j] and not need_full[j]]
    t0 = time.time()
    ft = runner._pe_sam_fast([c5[j] for j in fast_cand],
                             [c3i[j] for j in fast_cand], res, fast_cand)
    print(f"  fast emission ({len(fast_cand)} rows): "
          f"{(time.time()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
