"""Round-2 on-chip measurement battery (run on the real v5e-1, one process).

Stages (each guarded; results appended as JSON lines to bench_r2_results.jsonl
so partial progress survives a crash):

  attn    — grouped Pallas attention vs XLA at parity shapes (S=128/192)
  ffn     — fused weight-stationary FFN kernel vs XLA, plus full-encode A/B
  mips05  — fused MIPS kernel vs exact/approx XLA at 0.5M x 768 bf16
  mips88  — 8.8M x 768 bf16 search: qps + recall@100 vs exact oracle + HBM

Timing discipline (CLAUDE.md): the relay's block_until_ready can return at
dispatch, so every timed region reduces to a small array and forces a
transfer with np.asarray. Kernel A/Bs run N iterations inside one jit (scan)
so the tunnel round-trip amortizes.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS = "/root/repo/bench_r2_results.jsonl"
PEAK_BF16 = 197e12  # v5e peak bf16 FLOP/s


def emit(**kw):
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def timed_call(fn, *args, reps=1):
    """Median-of-3 wall time of fn(*args) with a forced transfer."""
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append((time.time() - t0) / reps)
    return float(np.median(ts))


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

assert jax.devices()[0].platform == "tpu", jax.devices()


def scan_bench(step_fn, x, iters=16):
    """jit a scan of step_fn composed iters times; returns compiled fn."""

    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    return run


# --------------------------------------------------------------- attention
def stage_attn():
    import simxns_tpu.ops.flash_attention as fa
    from simxns_tpu.ops.attention import _xla_attention

    B, H, D = 256, 12, 64
    for S in (128, 192):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, S, D), np.float32),
                        jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.int32)
        iters = 16

        def xla_step(q):
            out, _ = _xla_attention(q, q, q, None, return_probs=False)
            return out

        run_x = scan_bench(xla_step, q, iters)
        run_x(q)  # compile
        t_xla = timed_call(run_x, q) / iters

        results = {"xla_ms": t_xla * 1e3}
        for bb in (2, 4, 8):
            fa._GROUP_BB = bb

            def grp_step(q, _mask=mask):
                return fa._fused_attention_group(q, q, q, _mask)

            try:
                run_g = scan_bench(grp_step, q, iters)
                run_g(q)
                t = timed_call(run_g, q) / iters
                results[f"group_bb{bb}_ms"] = t * 1e3
            except Exception as e:  # noqa: BLE001
                results[f"group_bb{bb}_error"] = repr(e)[:300]

        # fwd+bwd comparison at the best bb
        fa._GROUP_BB = 2
        def loss_g(q):
            return jnp.sum(
                fa._fused_attention_group(q, q, q, mask).astype(jnp.float32) ** 2)

        def loss_x(q):
            out, _ = _xla_attention(q, q, q, None, return_probs=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        try:
            # reduce grads to a scalar so the tunnel transfer never
            # dominates the timing
            gg = jax.jit(lambda q: jnp.sum(
                jax.grad(loss_g)(q).astype(jnp.float32)))
            gx = jax.jit(lambda q: jnp.sum(
                jax.grad(loss_x)(q).astype(jnp.float32)))
            np.asarray(gg(q)); np.asarray(gx(q))
            results["grad_group_ms"] = timed_call(gg, q) * 1e3
            results["grad_xla_ms"] = timed_call(gx, q) * 1e3
        except Exception as e:  # noqa: BLE001
            results["grad_error"] = repr(e)[:300]
        emit(stage="attn", B=B, H=H, S=S, D=D, **results)


# --------------------------------------------------------------------- ffn
def stage_ffn():
    import simxns_tpu.ops.fused_ffn as ff

    M, H, F = 1024 * 128, 768, 3072
    rng = np.random.default_rng(1)
    x = jax.random.normal(jax.random.key(1, impl="rbg"), (M, H),
                          jnp.bfloat16)  # device-gen: 201MB over the tunnel
    w1 = jnp.asarray(rng.normal(0, 0.02, (H, F)), jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, (F, H)), jnp.float32)
    b2 = jnp.zeros((H,), jnp.float32)
    flops = 4 * M * H * F  # two GEMMs

    ITERS = 12  # chain like the 12-layer encoder; amortizes relay latency

    def chained(fn):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c, w1, b1, w2, b2), None

            out, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        return run

    def head(fn):
        return jax.jit(lambda *a: fn(*a)[:4].astype(jnp.float32))

    def flax_ffn(x, w1, b1, w2, b2):
        # what nn.Dense(dtype=bf16) actually lowers to: bf16 dot outputs
        dt = x.dtype
        h = jnp.dot(x, w1.astype(dt)) + b1.astype(dt)
        g = jax.nn.gelu(h, approximate=False)
        return jnp.dot(g, w2.astype(dt)) + b2.astype(dt)

    ref = chained(ff.ffn_reference)
    ref(x)
    t_ref = timed_call(ref, x) / ITERS
    flax = chained(flax_ffn)
    flax(x)
    t_flax = timed_call(flax, x) / ITERS

    res = {"xla_ms": t_ref * 1e3, "xla_mxu": flops / t_ref / PEAK_BF16,
           "xla_flax_ms": t_flax * 1e3,
           "xla_flax_mxu": flops / t_flax / PEAK_BF16}
    yr = np.asarray(head(ff.ffn_reference)(x, w1, b1, w2, b2))
    try:
        i8 = chained(ff.int8_ffn)
        i8(x)
        t = timed_call(i8, x) / ITERS
        res["int8_ms"] = t * 1e3
        res["int8_mxu_bf16eq"] = flops / t / PEAK_BF16
        y = np.asarray(head(ff.int8_ffn)(x, w1, b1, w2, b2))
        res["int8_maxerr"] = float(np.abs(y - yr).max())
    except Exception as e:  # noqa: BLE001
        res["int8_error"] = repr(e)[:300]
    for tile in (256, 512):
        try:
            fn = functools.partial(ff._fused, tile)
            fused = chained(fn)
            fused(x)
            t = timed_call(fused, x) / ITERS
            res[f"fused_t{tile}_ms"] = t * 1e3
            res[f"fused_t{tile}_mxu"] = flops / t / PEAK_BF16
            y = np.asarray(head(fn)(x, w1, b1, w2, b2))
            res[f"fused_t{tile}_maxerr"] = float(np.abs(y - yr).max())
        except Exception as e:  # noqa: BLE001
            res[f"fused_t{tile}_error"] = repr(e)[:300]
    emit(stage="ffn", M=M, H=H, F=F, **res)


def _encode_flops(B, S, L=12, H=768, F=3072):
    per_tok = L * 2 * (4 * H * H + 2 * H * F)        # projections + FFN
    attn = L * 2 * 2 * S * S * H                     # QK^T + PV per example
    return B * S * per_tok + B * attn


def stage_encode():
    import simxns_tpu.ops.flash_attention as fa
    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig

    B, S = 1024, 128
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(5, 30000, (B, S)), jnp.int32)
    mask = jnp.ones_like(ids)
    flops = _encode_flops(B, S)

    res = {}
    params = None
    for ffn, proj, layer in (("xla", "xla", "xla"), ("fused", "xla", "xla"),
                             ("int8", "xla", "xla"),
                             ("int8", "int8", "xla"),
                             ("xla", "xla", "fused_int8")):
        for attn in ("xla",):
            cfg = BiEncoderConfig(bert=BertConfig(
                num_layers=12, hidden_size=768, num_heads=12,
                intermediate_size=3072, dtype=jnp.bfloat16,
                ffn_impl=ffn, proj_impl=proj, layer_impl=layer,
                attention_impl="flash"))
            fa.SMALL_S_IMPL = attn if attn == "group" else "xla"
            model = BiEncoder(cfg)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), ids[:2, :32],
                                    mask[:2, :32], ids[:2], mask[:2])
            enc = jax.jit(lambda p, i, m, _model=model: jnp.sum(_model.apply(
                p, i, m, method="encode_passage").astype(jnp.float32)))
            tag = ("layer-fused_int8" if layer == "fused_int8"
                   else f"ffn-{ffn}_attn-{attn}" + (
                       "_proj-int8" if proj == "int8" else ""))
            try:
                enc(params, ids, mask)
                t = timed_call(enc, params, ids, mask)
                res[f"{tag}_ps"] = B / t
                res[f"{tag}_mxu"] = flops / t / PEAK_BF16
            except Exception as e:  # noqa: BLE001
                res[f"{tag}_error"] = repr(e)[:300]
    fa.SMALL_S_IMPL = "xla"
    emit(stage="encode", B=B, S=S, **res)


# -------------------------------------------------------------------- mips
def _recall(ids, oracle_ids):
    k = ids.shape[1]
    return float(np.mean([
        len(set(ids[i]) & set(oracle_ids[i])) / k
        for i in range(ids.shape[0])]))


def _search_fns(corpus, k):
    """Build jitted exact / approx / fused search over a device corpus."""
    from simxns_tpu.ops.topk import blocked_mips_topk
    from simxns_tpu.ops.mips_kernel import fused_mips_topk

    n = corpus.shape[0]

    @jax.jit
    def exact(q, c):
        return blocked_mips_topk(q, c, k, block_size=65536, mode="exact")

    @jax.jit
    def approx(q, c):
        return blocked_mips_topk(q, c, k, block_size=65536, mode="approx",
                                 recall_target=0.95)

    @jax.jit
    def fused(q, c):
        return fused_mips_topk(q, c, k, block_n=2048, block_q=256,
                               interpret=False)

    return {"exact": exact, "approx": approx, "fused": fused}


def _gen_corpus(n, h=768, chunks=32):
    """Chunked on-device bf16 normal generation.

    One-shot jax.random.normal materializes an f32 (and a bits) intermediate
    of the FULL size — 27 GB at 8.8M x 768, an instant OOM next to the
    13 GB bf16 target. Generating chunk-by-chunk into a carried bf16 buffer
    caps the f32 temp at n/chunks rows.
    """
    assert n % chunks == 0
    rows = n // chunks
    key = jax.random.key(0, impl="rbg")

    @jax.jit
    def gen():
        def body(i, buf):
            blk = jax.random.normal(jax.random.fold_in(key, i),
                                    (rows, h), jnp.float32)
            return jax.lax.dynamic_update_slice(
                buf, blk.astype(jnp.bfloat16), (i * rows, 0))

        return jax.lax.fori_loop(0, chunks, body,
                                 jnp.zeros((n, h), jnp.bfloat16))

    return gen()


def stage_mips(n, tag, modes=("exact", "approx", "fused"), q_total=1024,
               reps=8):
    q_total = max(q_total, reps * 256)
    corpus = _gen_corpus(n)
    np.asarray(corpus[0, :1])  # force generation before timing
    queries = jax.random.normal(jax.random.key(1, impl="rbg"),
                                (q_total, 768), jnp.bfloat16)
    k = 100
    qb = 256

    fns = _search_fns(corpus, k)
    res = {}
    oracle = None
    # oracle: exact top-k on the first 128 queries
    try:
        o_s, o_i = fns["exact"](queries[:128], corpus)
        oracle = np.asarray(o_i)
    except Exception as e:  # noqa: BLE001
        res["oracle_error"] = repr(e)[:300]

    q_stack = queries[: reps * qb].reshape(reps, qb, 768)
    for mode in modes:
        fn = fns[mode]
        try:
            # amortize the relay round-trip: `reps` query batches inside one
            # jitted scan, reduced to a checksum
            @jax.jit
            def run(qs, c, _fn=fn):
                def body(_, q):
                    s, i = _fn(q, c)
                    return None, jnp.sum(i)

                _, sums = jax.lax.scan(body, None, qs)
                return sums

            np.asarray(run(q_stack, corpus))
            t = timed_call(run, q_stack, corpus)
            res[f"{mode}_qps"] = reps * qb / t
            if oracle is not None:
                _, ii = fn(queries[:128], corpus)
                res[f"{mode}_recall100"] = _recall(np.asarray(ii), oracle)
        except Exception as e:  # noqa: BLE001
            res[f"{mode}_error"] = repr(e)[:300]

    try:
        stats = jax.devices()[0].memory_stats()
        res["hbm_peak_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:  # noqa: BLE001
        pass
    emit(stage=tag, n=n, k=k, **res)
    del corpus, queries


def _gen_corpus_t(n, h=768, chunks=32):
    """Chunked on-device generation of a TRANSPOSED [H, N] bf16 corpus."""
    assert n % chunks == 0
    cols = n // chunks
    key = jax.random.key(0, impl="rbg")

    @jax.jit
    def gen():
        def body(i, buf):
            blk = jax.random.normal(jax.random.fold_in(key, i),
                                    (h, cols), jnp.float32)
            return jax.lax.dynamic_update_slice(
                buf, blk.astype(jnp.bfloat16), (0, i * cols))

        return jax.lax.fori_loop(0, chunks, body,
                                 jnp.zeros((h, n), jnp.bfloat16))

    return gen()


def _exact_topk_t(queries, corpus_t, k, block=65536):
    """Exact oracle over a [H, N] corpus (blocked running top-k)."""
    h, n = corpus_t.shape
    q = queries.shape[0]
    blocks = corpus_t.reshape(h, n // block, block).transpose(1, 0, 2)

    def step(carry, inp):
        best_s, best_i = carry
        blk, b_idx = inp
        s = jnp.einsum("qh,hb->qb", queries, blk,
                       preferred_element_type=jnp.float32)
        ids = b_idx * block + jax.lax.broadcasted_iota(
            jnp.int32, (q, block), 1)
        cs = jnp.concatenate([best_s, s], axis=1)
        ci = jnp.concatenate([best_i, ids], axis=1)
        ns, sel = jax.lax.top_k(cs, k)
        return (ns, jnp.take_along_axis(ci, sel, axis=1)), None

    init = (jnp.full((q, k), -1e30, jnp.float32),
            jnp.full((q, k), -1, jnp.int32))
    (s, i), _ = jax.lax.scan(step, init,
                             (blocks, jnp.arange(n // block, jnp.int32)))
    return s, i


def stage_mips_t(n, tag, reps=8, sweeps=((2048, 256, 128),
                                         (2048, 512, 128),
                                         (4096, 256, 256))):
    """Fused kernel on the MXU-native [H, N] layout: qps + recall sweeps."""
    from simxns_tpu.ops.mips_kernel import fused_mips_topk_t

    corpus_t = _gen_corpus_t(n)
    np.asarray(corpus_t[0, :1])
    qb = 256
    q_total = reps * qb
    queries = jax.random.normal(jax.random.key(1, impl="rbg"),
                                (q_total, 768), jnp.bfloat16)
    k = 100
    res = {}
    try:
        oracle = np.asarray(jax.jit(
            lambda q, c: _exact_topk_t(q, c, k)[1])(queries[:128], corpus_t))
    except Exception as e:  # noqa: BLE001
        oracle = None
        res["oracle_error"] = repr(e)[:300]

    q_stack = queries.reshape(reps, qb, 768)
    for bn, bq, bucket in sweeps:
        name = f"bn{bn}_bq{bq}_bk{bucket}"
        try:
            @jax.jit
            def run(qs, c, _bn=bn, _bq=bq, _bk=bucket):
                def body(_, q):
                    s, i = fused_mips_topk_t(
                        q, c, k, block_n=_bn, block_q=_bq, bucket=_bk,
                        interpret=False)
                    return None, jnp.sum(i)

                _, sums = jax.lax.scan(body, None, qs)
                return sums

            np.asarray(run(q_stack, corpus_t))
            t = timed_call(run, q_stack, corpus_t)
            res[f"{name}_qps"] = reps * qb / t
            if oracle is not None:
                _, ii = jax.jit(functools.partial(
                    fused_mips_topk_t, k=k, block_n=bn, block_q=bq,
                    bucket=bucket, interpret=False))(queries[:128], corpus_t)
                res[f"{name}_recall100"] = _recall(np.asarray(ii), oracle)
        except Exception as e:  # noqa: BLE001
            res[f"{name}_error"] = repr(e)[:300]
    try:
        stats = jax.devices()[0].memory_stats()
        res["hbm_peak_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:  # noqa: BLE001
        pass
    emit(stage=tag, n=n, k=k, **res)
    del corpus_t, queries


def stage_serve():
    """Serving query path: fused encode+search device time vs e2e latency.

    Round-1's 77ms p50 was relay-dominated; this splits device compute
    (scan-amortized inside one jit) from the end-to-end dispatch+transfer
    round-trip a tunneled client sees. On co-located production hosts the
    device number is the p50 driver.
    """
    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
    from simxns_tpu.index import MIPSIndex
    from simxns_tpu.parallel import create_mesh

    mesh = create_mesh()
    cfg = BiEncoderConfig(bert=BertConfig(
        num_layers=12, hidden_size=768, num_heads=12,
        intermediate_size=3072, dtype=jnp.bfloat16))
    model = BiEncoder(cfg)
    rng = np.random.default_rng(3)
    qi = jnp.asarray(rng.integers(5, 30000, (8, 32)), jnp.int32)
    qm = jnp.ones_like(qi)
    params = model.init(jax.random.PRNGKey(0), qi[:2], qm[:2],
                        qi[:2], qm[:2])
    n = 1_048_576  # 1M-passage serving index
    corpus = _gen_corpus(n, chunks=16)
    np.asarray(corpus[0, :1])
    index = MIPSIndex(mesh, block_size=65536, mode="approx")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from simxns_tpu.parallel.mesh import DATA_AXIS
    index.embeddings = jax.device_put(
        corpus, NamedSharding(mesh, P(DATA_AXIS, None)))
    index.num_rows = n
    search = index._make_search_fn(10)
    scales = index._scales_arg()

    def query_once(params, qi, qm, emb):
        q_emb = model.apply(params, qi, qm, method="encode_query")
        return search(q_emb.astype(emb.dtype), emb, scales)

    e2e = jax.jit(query_once)
    np.asarray(e2e(params, qi, qm, index.embeddings)[1])
    t_e2e = timed_call(lambda: e2e(params, qi, qm, index.embeddings)[1])

    @jax.jit
    def device16(params, qi, qm, emb):
        def body(c, _):
            s, i = query_once(params, qi, qm, emb)
            return c + jnp.sum(i), None

        out, _ = jax.lax.scan(body, jnp.int32(0), None, length=16)
        return out

    np.asarray(device16(params, qi, qm, index.embeddings))
    t_dev = timed_call(device16, params, qi, qm, index.embeddings) / 16
    emit(stage="serve", n=n, batch=8, k=10,
         device_ms=t_dev * 1e3, e2e_ms=t_e2e * 1e3)


def _gen_corpus_int8(n, h=768, chunks=32):
    """Generate an int8-quantized corpus on-device without the f32 source
    ever existing in full (codes [N,H] i8 + per-row scales f32)."""
    from simxns_tpu.ops.mips_kernel import quantize_rows

    assert n % chunks == 0
    rows = n // chunks
    key = jax.random.key(0, impl="rbg")

    @jax.jit
    def gen():
        def body(i, bufs):
            codes_buf, scale_buf = bufs
            blk = jax.random.normal(jax.random.fold_in(key, i),
                                    (rows, h), jnp.float32)
            codes, scales = quantize_rows(blk)
            return (jax.lax.dynamic_update_slice(codes_buf, codes,
                                                 (i * rows, 0)),
                    jax.lax.dynamic_update_slice(scale_buf, scales,
                                                 (i * rows,)))

        return jax.lax.fori_loop(
            0, chunks, body,
            (jnp.zeros((n, h), jnp.int8), jnp.zeros((n,), jnp.float32)))

    return gen()


def stage_mips_int8(n, tag, reps=8, fidelity=False):
    """Int8 (SQ8-analog) index at scale: qps + recall; halves index HBM."""
    from simxns_tpu.ops.mips_kernel import (fused_mips_topk_int8,
                                             quantize_rows)
    from simxns_tpu.ops.topk import blocked_mips_topk

    codes, scales = _gen_corpus_int8(n)
    np.asarray(codes[0, :1])
    qb = 256
    queries = jax.random.normal(jax.random.key(1, impl="rbg"),
                                (reps * qb, 768), jnp.bfloat16)
    k = 100
    res = {}

    @jax.jit
    def exact_i8(q, c, s):
        return blocked_mips_topk(q, c, k, block_size=65536, mode="exact",
                                 row_scales=s)

    try:
        oracle = np.asarray(exact_i8(queries[:128], codes, scales)[1])
    except Exception as e:  # noqa: BLE001
        oracle = None
        res["oracle_error"] = repr(e)[:300]

    if fidelity:
        # quantization fidelity: int8-exact vs bf16-exact on the SAME data
        try:
            bf = _gen_corpus(n)

            @jax.jit
            def exact_bf(q, c):
                return blocked_mips_topk(q, c, k, block_size=65536,
                                         mode="exact")

            truth = np.asarray(exact_bf(queries[:128], bf)[1])
            c2, s2 = jax.jit(quantize_rows)(bf)
            q_ids = np.asarray(exact_i8(queries[:128], c2, s2)[1])
            res["sq8_recall100_vs_f32"] = _recall(q_ids, truth)
            del bf, c2, s2
        except Exception as e:  # noqa: BLE001
            res["fidelity_error"] = repr(e)[:300]

    q_stack = queries.reshape(reps, qb, 768)
    fns = {
        "fused_i8": lambda q, c, s: fused_mips_topk_int8(
            q, c, s, k, block_n=2048, block_q=256, interpret=False),
        "approx_i8": lambda q, c, s: blocked_mips_topk(
            q, c, k, block_size=65536, mode="approx", recall_target=0.95,
            row_scales=s),
    }
    for name, fn in fns.items():
        try:
            @jax.jit
            def run(qs, c, s, _fn=fn):
                def body(_, q):
                    sc, i = _fn(q, c, s)
                    return None, jnp.sum(i)

                _, sums = jax.lax.scan(body, None, qs)
                return sums

            np.asarray(run(q_stack, codes, scales))
            t = timed_call(run, q_stack, codes, scales)
            res[f"{name}_qps"] = reps * qb / t
            if oracle is not None:
                _, ii = jax.jit(fn)(queries[:128], codes, scales)
                res[f"{name}_recall100_vs_i8exact"] = _recall(
                    np.asarray(ii), oracle)
        except Exception as e:  # noqa: BLE001
            res[f"{name}_error"] = repr(e)[:300]
    try:
        stats = jax.devices()[0].memory_stats()
        res["hbm_peak_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:  # noqa: BLE001
        pass
    emit(stage=tag, n=n, k=k, **res)


def stage_train():
    """Train-step throughput at the reference's AR2 working point.

    The reference publishes no train throughput (BASELINE.md) — its only
    wall-clock hint is the mine phase — so this records OUR envelope:
    the AR2 retriever step (DE fwd/bwd + frozen CE teacher fwd) at the
    ``train_NQ_AR2.sh`` shapes (global batch 64, 1+15 ctx/question,
    q=32/ctx=128/joint=160, BERT-base bf16), plus the big-batch
    contrastive DE step (the GradCache-capability workload).
    """
    from simxns_tpu.models import (BiEncoder, BiEncoderConfig, BertConfig,
                                   CrossEncoder, CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (TrainState, make_adamw,
                                  make_ar2_retriever_step,
                                  make_biencoder_step)

    mesh = create_mesh()
    # remat=True (the GradCache analog): fwd+bwd at these batch shapes
    # holds ~13.5G of activation temps without it and OOMs one v5e-16G
    # (measured: bare B=512 fwd+bwd fits at 501 ms/step, +adam temps do
    # not). The reference needed GradCache for exactly this reason.
    bert = BertConfig(num_layers=12, hidden_size=768, num_heads=12,
                      intermediate_size=3072, dtype=jnp.bfloat16,
                      remat=True)
    de = BiEncoder(BiEncoderConfig(bert=bert))
    ce = CrossEncoder(CrossEncoderConfig(bert=bert))
    rng = np.random.default_rng(0)
    tx = make_adamw(1e-5, total_steps=0)
    dummy = np.ones((2, 16), np.int32)
    de_params = de.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy)
    ce_params = ce.init(jax.random.PRNGKey(1), dummy, dummy)
    res = {}

    def time_steps(step, state, *rest, k=6):
        out = step(state, *rest)                     # compile + 1st step
        state = out[0]
        state, _ = step(state, *rest)                # 2nd warm (layouts)
        t0 = time.time()
        for _ in range(k):
            state, metrics = step(state, *rest)
        np.asarray(metrics["loss"])
        return (time.time() - t0) / k

    # --- AR2 retriever step, reference shapes -----------------------------
    n, m, lq, lc, lj = 64, 16, 32, 128, 160
    batch = {
        "q_ids": rng.integers(5, 30000, (n, lq)).astype(np.int32),
        "q_mask": np.ones((n, lq), np.int32),
        "ctx_ids": rng.integers(5, 30000, (n * m, lc)).astype(np.int32),
        "ctx_mask": np.ones((n * m, lc), np.int32),
        "joint_ids": rng.integers(5, 30000, (n, m, lj)).astype(np.int32),
        "joint_mask": np.ones((n, m, lj), np.int32),
        "positive_idx": (np.arange(n) * m).astype(np.int32),
    }
    try:
        state = TrainState.create(jax.tree.map(jnp.copy, de_params), tx)
        step = make_ar2_retriever_step(de, ce, tx, mesh, adv_lambda=0.5)
        dt = time_steps(step, state, ce_params, shard_batch(batch, mesh))
        flops = (3 * (_encode_flops(n, lq) + _encode_flops(n * m, lc))
                 + _encode_flops(n * m, lj))
        res["ar2_step_ms"] = dt * 1e3
        res["ar2_steps_per_s"] = 1.0 / dt
        res["ar2_mfu"] = flops / dt / PEAK_BF16
        del state, step
    except Exception as e:  # noqa: BLE001
        res["ar2_error"] = repr(e)[:300]
    import gc

    gc.collect()

    # --- big-batch in-batch contrastive DE step (global batch 512) --------
    nb = 512
    big = {
        "q_ids": rng.integers(5, 30000, (nb, lq)).astype(np.int32),
        "q_mask": np.ones((nb, lq), np.int32),
        "ctx_ids": rng.integers(5, 30000, (nb, lc)).astype(np.int32),
        "ctx_mask": np.ones((nb, lc), np.int32),
        "positive_idx": np.arange(nb, dtype=np.int32),
    }
    try:
        state = TrainState.create(jax.tree.map(jnp.copy, de_params), tx)
        step = make_biencoder_step(de, tx, mesh, grad_mode="full")
        dt = time_steps(step, state, shard_batch(big, mesh))
        flops = 3 * (_encode_flops(nb, lq) + _encode_flops(nb, lc))
        res["de512_step_ms"] = dt * 1e3
        res["de512_steps_per_s"] = 1.0 / dt
        res["de512_mfu"] = flops / dt / PEAK_BF16
        res["de512_examples_per_s"] = nb / dt
    except Exception as e:  # noqa: BLE001
        res["de512_error"] = repr(e)[:300]
    emit(stage="train", **res)


STAGES = {
    "serve": stage_serve,
    "train": stage_train,
    "attn": stage_attn,
    "ffn": stage_ffn,
    "encode": stage_encode,
    "mips05": lambda: stage_mips(524288, "mips05"),
    "mips88": lambda: stage_mips(8847360, "mips88",
                                 modes=("approx", "fused")),
    "mips05t": lambda: stage_mips_t(524288, "mips05t"),
    "mips88t": lambda: stage_mips_t(8847360, "mips88t"),
    "mips2m_i8": lambda: stage_mips_int8(2097152, "mips2m_i8",
                                         fidelity=True),
    "mips88_i8": lambda: stage_mips_int8(8847360, "mips88_i8"),
    "mips16m_i8": lambda: stage_mips_int8(16777216, "mips16m_i8"),
}

if __name__ == "__main__":
    wanted = sys.argv[1:] or list(STAGES)
    for name in wanted:
        print(f"=== stage {name} ===", flush=True)
        t0 = time.time()
        try:
            STAGES[name]()
        except Exception as e:  # noqa: BLE001
            emit(stage=name, fatal=repr(e)[:500])
        print(f"=== stage {name} done in {time.time()-t0:.0f}s ===",
              flush=True)
