"""Headline benchmark: the mine phase at reference scale on real hardware.

The only wall-clock number the reference publishes is "Evaluation 3h totally"
for the 8-GPU MARCO corpus encode + search (``MASTER/finetune/
ft_MS_MASTER.sh:23``, SURVEY.md §6): 8.8M passages / 8 A100s / 3h
~= 102 passages/s per A100 for the encode-dominated mine phase. That is the
``vs_baseline`` denominator (per-chip).

Two measured components, composed into the reference's working point
(8.8M passages, ~7k MARCO-dev queries, top-100):

- encode rate: BERT-base bf16 seq-128 passages through the real
  ``CorpusEncoder`` path (16k-passage sample — the rate is flat in corpus
  size), reported with MFU against the v5e bf16 peak;
- search: top-100 over an actual 8.8M x 768 bf16 HBM-resident index (built
  on-device), with recall@100 against an exact-scan oracle on a 128-query
  subset — the FAISS-fp16 fidelity check VERDICT r1 asked for.

Timing forces transfers (np.asarray) because this relay's
``block_until_ready`` can return at dispatch (CLAUDE.md).

Reproducibility (VERDICT r2 weak #1): every timed stage runs ``REPS``
(default 3) in-process repetitions and the headline composes the MEDIANS;
the JSON carries min/median/max spread so run-to-run chip variance through
the relay (measured up to -40%) is visible in the number of record instead
of being quoted away. README quotes THIS script's output, not best-ever
sessions.

Session calibration (VERDICT r3 weak #1 — BENCH_r03 regressed 28% below
r02 while capability rose ~2x, because the whole capture landed in a
degraded relay session): before any stage, a pure-GEMM roofline probe
(the FFN-shape bf16 chain scripts/train_prof.py anchors against; best
recorded 0.87 MXU = ~171 TFLOP/s) measures THIS session. Below
``CAL_MIN_FRAC`` (default 0.7) of the best recorded roofline the bench
sleeps and re-probes up to ``SIMXNS_BENCH_CAL_TRIES`` times, then runs
anyway — but every JSON now carries ``session_roofline_tflops`` /
``session_roofline_frac``, so a slow-session capture is machine-
distinguishable from a real regression. Each stage also runs one
full-size warm pass before its timed reps (VERDICT r3 weak #5: rep-1
was paying session ramp inside its timing).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPS = int(os.environ.get("SIMXNS_BENCH_REPS", "3"))

A100_REF_PASSAGES_PER_SEC_PER_GPU = 8_800_000 / 8 / (3 * 3600)  # ~101.9
PEAK_BF16 = 197e12            # v5e bf16 FLOP/s per chip
REF_CORPUS = 8_800_000        # MARCO passage corpus
REF_QUERIES = 7_000           # MARCO dev queries mined per refresh

# best pure-GEMM roofline ever recorded on this chip (scripts/train_prof.py
# FFN-shape bf16 chain, round 3: 0.87 MXU) — the denominator a session is
# judged against
BEST_ROOFLINE_TFLOPS = 171.0
CAL_MIN_FRAC = float(os.environ.get("SIMXNS_BENCH_CAL_MIN", "0.7"))
CAL_TRIES = int(os.environ.get("SIMXNS_BENCH_CAL_TRIES", "4"))
CAL_SLEEP_S = 90.0


def _encode_flops(B, S, L=12, H=768, F=3072):
    per_tok = L * 2 * (4 * H * H + 2 * H * F)
    attn = L * 2 * 2 * S * S * H
    return B * S * per_tok + B * attn


def _probe_roofline(jax, jnp):
    """This session's pure-GEMM rate (TFLOP/s): the FFN-shape bf16 chain
    of scripts/train_prof.py, burst-timed with a tiny-slice force (a full
    transfer through the relay tunnel would swamp the timed region)."""
    M = 81920
    a0 = jnp.ones((M, 768), jnp.bfloat16)
    w1 = jnp.ones((768, 3072), jnp.bfloat16) * 0.01
    w2 = jnp.ones((3072, 768), jnp.bfloat16) * 0.01
    n_ch = 8

    @jax.jit
    def chain(a, w1, w2):
        def body(x, _):
            return (x @ w1 @ w2).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, a, None, length=n_ch)
        return y

    for _ in range(2):
        out = chain(a0, w1, w2)
    np.asarray(out.ravel()[:1])
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(4):
            out = chain(a0, w1, w2)
        np.asarray(out.ravel()[:1])
        ts.append((time.time() - t0) / 4)
    fl = n_ch * 2 * M * 768 * 3072 * 2
    return fl / float(np.median(ts)) / 1e12


def _guarded_reps(fn, reps, probe=None, min_frac=0.5, max_extra=2):
    """Time ``reps`` executions of ``fn``; rerun intra-session outliers.

    VERDICT r4 weak #4: BENCH_r04's encode spread was [1277, 6063, 6128]
    p/s — one rep ran 4.7x slow INSIDE a session the roofline probe had
    just passed at 0.86. The median defended the headline; two slow reps
    would not have been defended. So: after the reps, any rep slower than
    ``min_frac`` of the session's best rep is re-probed (roofline context
    recorded) and rerun, up to ``max_extra`` times total; what was
    dropped goes into the JSON instead of being quoted away.
    Returns (times, dropped_records)."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    dropped = []
    while len(dropped) < max_extra:
        best = min(times)
        worst_i = max(range(len(times)), key=lambda i: times[i])
        if times[worst_i] <= best / min_frac:
            break
        rec = {"rep_s": round(times[worst_i], 3),
               "best_rep_s": round(best, 3)}
        if probe is not None:
            rec["roofline_tflops_at_rerun"] = round(probe(), 1)
        dropped.append(rec)
        t0 = time.time()
        fn()
        times[worst_i] = time.time() - t0
    return times, dropped


def _calibrate_session(jax, jnp, on_tpu):
    """Probe the session; below CAL_MIN_FRAC of the best recorded roofline,
    sleep and re-probe up to CAL_TRIES times (relay sessions recover), then
    proceed regardless — the JSON carries the verdict either way."""
    if not on_tpu:
        return {"session_roofline_tflops": None,
                "session_roofline_frac": None, "calibration_attempts": 0}
    attempts = 0
    best = 0.0
    while True:
        attempts += 1
        best = max(best, _probe_roofline(jax, jnp))
        frac = best / BEST_ROOFLINE_TFLOPS
        print(f"# session roofline probe {attempts}: {best:.1f} TFLOP/s "
              f"({frac:.2f} of best recorded)", flush=True)
        if frac >= CAL_MIN_FRAC or attempts > CAL_TRIES:
            break
        time.sleep(CAL_SLEEP_S)
    return {"session_roofline_tflops": round(best, 1),
            "session_roofline_frac": round(frac, 3),
            "calibration_attempts": attempts}


def main():
    import jax
    import jax.numpy as jnp

    from simxns_tpu.index import CorpusEncoder, MIPSIndex
    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
    from simxns_tpu.parallel import create_mesh
    from simxns_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    on_tpu = jax.devices()[0].platform == "tpu"
    mesh = create_mesh()
    n_chips = int(np.prod(list(mesh.shape.values())))

    cal = _calibrate_session(jax, jnp, on_tpu)

    # ---- encode rate (the phase's dominant share) -------------------------
    # The whole-layer fused int8 kernel is the encode-path default
    # (measured v5e-1: 7046 p/s at 0.80 bf16-equivalent MXU vs 4530
    # int8-FFN-only vs 3790 XLA; CLS cosine vs f32 > 0.999 —
    # tests/test_fused_layer.py). SIMXNS_BENCH_ENCODE=int8|fused|xla
    # selects the older per-op paths.
    enc_impl = os.environ.get("SIMXNS_BENCH_ENCODE", "fused_layer")
    if enc_impl == "fused_layer":
        bert_kw = {"layer_impl": "fused_int8"}
    else:
        bert_kw = {"ffn_impl": enc_impl}
    cfg = BiEncoderConfig(
        bert=BertConfig(num_layers=12, hidden_size=768, num_heads=12,
                        intermediate_size=3072, dtype=jnp.bfloat16,
                        **bert_kw))
    model = BiEncoder(cfg)

    seq = 128
    chunk = int(os.environ.get("SIMXNS_BENCH_CHUNK", 1024 * n_chips))
    n_sample = int(os.environ.get("SIMXNS_BENCH_SAMPLE_CHUNKS", "16")) * chunk
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, size=(n_sample, seq)).astype(np.int32)
    mask = np.ones_like(ids)

    params = model.init(jax.random.PRNGKey(0), ids[:2, :32], mask[:2, :32],
                        ids[:2], mask[:2])

    encode_fn = lambda p, i, m: model.apply(p, i, m, method="encode_passage")
    # Default path: MIPSIndex.build_streaming — what the mine phase actually
    # runs since round 4 (encode -> int8 quantize -> scatter fused on
    # device, uint16 ids on the wire, embeddings never visit the host).
    # SIMXNS_BENCH_ENCODE_PATH=host measures the older CorpusEncoder
    # round-trip (ids up, f32 embeddings down) for A/B.
    enc_path = os.environ.get("SIMXNS_BENCH_ENCODE_PATH", "stream")
    if enc_path == "stream":
        ids[:, 0] = 101                             # CLS: no all-pad rows
        enc_index = MIPSIndex(mesh, block_size=8192, store_dtype=jnp.int8)

        def encode_pass():
            enc_index.build_streaming(encode_fn, params, ids,
                                      chunk_size=chunk,
                                      wire_dtype=np.uint16)
            # force completion: the scatter chain is async (CLAUDE.md —
            # block_until_ready can return at dispatch on this relay)
            np.asarray(enc_index.embeddings[-1, :1])
    else:
        enc = CorpusEncoder(encode_fn, mesh, chunk_size=chunk)

        def encode_pass():
            enc(params, ids, mask)                  # np round-trip = forced

    probe = (lambda: _probe_roofline(jax, jnp)) if on_tpu else None
    encode_pass()                   # compile
    encode_pass()                   # full-size warm pass (session ramp /
                                    # pipeline fill stay out of rep 1)
    encode_times, encode_dropped = _guarded_reps(encode_pass, REPS,
                                                 probe=probe)
    encode_s = float(np.median(encode_times))
    encode_ps = n_sample / encode_s
    mfu = _encode_flops(n_sample, seq) / encode_s / (PEAK_BF16 * n_chips)

    # ---- search over a reference-scale index ------------------------------
    # 8.8M x 768 bf16 (12.7 GiB — HBM-resident on one v5e chip, like the
    # reference's FAISS fp16 shards across 8 GPUs). Rows generated on-device
    # in chunks (a one-shot normal would materialize a 27 GB f32 temp).
    n_rows = int(os.environ.get("SIMXNS_BENCH_ROWS",
                                8_847_360 if on_tpu else 65_536))
    gen_chunks = 32
    rows = n_rows // gen_chunks
    key = jax.random.key(0, impl="rbg")

    @jax.jit
    def gen():
        def body(i, buf):
            blk = jax.random.normal(jax.random.fold_in(key, i),
                                    (rows, 768), jnp.float32)
            return jax.lax.dynamic_update_slice(
                buf, blk.astype(jnp.bfloat16), (i * rows, 0))

        return jax.lax.fori_loop(0, gen_chunks, body,
                                 jnp.zeros((gen_chunks * rows, 768),
                                           jnp.bfloat16))

    corpus = gen()
    np.asarray(corpus[0, :1])

    index = MIPSIndex(mesh, block_size=65536, mode="approx",
                      recall_target=0.95)
    index.embeddings = jax.device_put(
        corpus, NamedSharding(mesh, P(DATA_AXIS, None)))
    index.num_rows = corpus.shape[0]

    n_queries = REF_QUERIES
    q = np.asarray(jax.random.normal(jax.random.key(1, impl="rbg"),
                                     (1024, 768), jnp.bfloat16), np.float32)
    q = np.tile(q, (n_queries // 1024 + 1, 1))[:n_queries]
    # warm with the SAME (k, query_batch) cache key as the timed calls —
    # a 256-query warmup compiles a different executable (qb=256) and the
    # qb=1024 compile lands inside the timed region (ADVICE r2, medium)
    index.search(q[:1024], 100)                     # compile, qb=1024
    index.search(q, 100)            # full-size warm pass (VERDICT r3 weak
                                    # #5: rep-1 paid warmup in its timing)
    found = {}

    def search_pass():
        _, found["ids"] = index.search(q, 100)

    search_times, search_dropped = _guarded_reps(search_pass, REPS,
                                                 probe=probe)
    ids_found = found["ids"]
    search_s = float(np.median(search_times))

    # recall@100 vs exact oracle on a 128-query subset
    exact = MIPSIndex(mesh, block_size=65536, mode="exact")
    exact.embeddings = index.embeddings
    exact.num_rows = index.num_rows
    _, oracle = exact.search(q[:128], 100)
    recall = float(np.mean([
        len(set(ids_found[i]) & set(oracle[i])) / 100 for i in range(128)]))

    # ---- compose the reference working point ------------------------------
    # medians compose the headline; min/max expose relay run-to-run variance
    total_s = REF_CORPUS / encode_ps + search_s * (REF_QUERIES / n_queries)
    per_chip = REF_CORPUS / total_s / n_chips
    result = {
        "metric": "mine_phase_passages_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": ("passages/s/chip (8.8M-corpus mine: BERT-base bf16 seq128 "
                 "%s encode via %s + top-100 search over %d-row bf16 index; "
                 "median of %d reps)" % (enc_impl, enc_path, n_rows, REPS)),
        "vs_baseline": round(per_chip / A100_REF_PASSAGES_PER_SEC_PER_GPU, 2),
        "encode_ps_per_chip": round(encode_ps / n_chips, 1),
        "encode_ps_spread": [round(n_sample / t / n_chips, 1)
                             for t in (max(encode_times),
                                       float(np.median(encode_times)),
                                       min(encode_times))],
        "encode_mfu": round(mfu, 4),
        "search_qps": round(n_queries / search_s, 1),
        "search_qps_spread": [round(n_queries / t, 1)
                              for t in (max(search_times),
                                        float(np.median(search_times)),
                                        min(search_times))],
        "recall_at_100": round(recall, 4),
        "index_rows": n_rows,
        "reps": REPS,
        # per-rep session guard (VERDICT r4 weak #4): reps rerun as
        # intra-session outliers, with the roofline re-probe at that moment
        "dropped_encode_reps": encode_dropped,
        "dropped_search_reps": search_dropped,
        **cal,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
