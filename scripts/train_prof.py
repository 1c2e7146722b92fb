"""Decompose the DE train step: where do the milliseconds go?

VERDICT r2 #1 asks for a >=1.5x train-step lift *or a measured null*. The
honest denominator for "attainable" is this chip's pure-GEMM rate measured
in the SAME session (run-to-run variance through the relay reaches 40%,
CLAUDE.md). This script measures, one process, back-to-back:

  gemm_anchor   scan-chain of bf16 GEMMs at the step's dominant shapes
                -> the session's attainable MXU fraction
  fwd           loss value only (encode q + ctx + in-batch NLL)
  fwd_bwd       value_and_grad, no optimizer
  step          full donated step (value_and_grad + AdamW)

All with BERT-base bf16, batch 512 (Lq=32, Lc=128), remat off — the round-3
battery's fastest variant (bench_r3_results.jsonl: noremat 510 ms).

    python scripts/train_prof.py [--batch 512] [--k 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

PEAK_BF16 = 197e12
RESULTS = "/root/repo/bench_r3_results.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw
    from simxns_tpu.losses.contrastive import in_batch_nll
    from scripts.bench_r3 import bert_flops, _train_batch, _time_steps

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    nq = args.batch
    batch = shard_batch(_train_batch(rng, nq=nq), mesh)
    fwd_flops = bert_flops(nq * (32 + 128), 2 * nq)

    def timeit(fn, *a, k=args.k):
        # force with a TINY slice: transferring a full output through the
        # relay tunnel (~25 MB/s) swamps the timed region (the first run
        # of this script read a 0.043-MXU "GEMM anchor" because each rep
        # shipped a 125 MB array host-side; the clean anchor is 0.87)
        def force(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.ravel()[:1])
        for _ in range(2):
            out = fn(*a)
        force(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(k):
                out = fn(*a)
            force(out)
            ts.append((time.time() - t0) / k)
        return float(np.median(ts)) * 1000

    out = {}

    # ---- GEMM ceiling anchor: the step's two dominant GEMM shapes --------
    # tokens = 512*160 = 81920 rows; H->4H and H->H chains, bf16.
    M = nq * 160
    a0 = jnp.ones((M, 768), jnp.bfloat16)
    w1 = jnp.ones((768, 3072), jnp.bfloat16) * 0.01
    w2 = jnp.ones((3072, 768), jnp.bfloat16) * 0.01

    @jax.jit
    def gemm_chain(a, w1, w2, n=8):
        def body(x, _):
            return (x @ w1 @ w2).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, a, None, length=n)
        return y

    n_ch = 8
    ms = timeit(gemm_chain, a0, w1, w2)
    gemm_fl = n_ch * 2 * M * 768 * 3072 * 2
    out["gemm_anchor"] = {"ms": round(ms, 2),
                          "mxu_frac": round(gemm_fl / (ms / 1e3) / PEAK_BF16,
                                            4)}
    print("gemm_anchor", out["gemm_anchor"], flush=True)

    # ---- model paths ------------------------------------------------------
    cfg = BertConfig(dtype=jnp.bfloat16, remat=False)
    model = BiEncoder(BiEncoderConfig(bert=cfg))
    params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])

    def loss_fn(p, b):
        q_emb, ctx_emb = model.apply(p, b["q_ids"], b["q_mask"],
                                     b["ctx_ids"], b["ctx_mask"],
                                     deterministic=True)
        loss, correct = in_batch_nll(q_emb, ctx_emb, b["positive_idx"])
        return loss, {"correct": correct}

    fwd = jax.jit(lambda p, b: loss_fn(p, b)[0])
    ms = timeit(fwd, params, batch)
    out["fwd"] = {"ms": round(ms, 2),
                  "mfu": round(fwd_flops / (ms / 1e3) / PEAK_BF16, 4)}
    print("fwd", out["fwd"], flush=True)

    vg = jax.jit(lambda p, b: jax.value_and_grad(loss_fn, has_aux=True)(p, b))
    ms = timeit(vg, params, batch)
    out["fwd_bwd"] = {"ms": round(ms, 2),
                      "mfu_3x": round(3 * fwd_flops / (ms / 1e3) / PEAK_BF16,
                                      4)}
    print("fwd_bwd", out["fwd_bwd"], flush=True)

    # ---- full step (donated) ---------------------------------------------
    tx = make_adamw(1e-5, total_steps=0)
    state = TrainState.create(params, tx)

    from simxns_tpu.train import make_biencoder_step
    step = make_biencoder_step(model, tx, mesh, grad_mode="full")
    ms, state = _time_steps(step, state, (), batch, k=args.k)
    out["step"] = {"ms": round(ms, 2),
                   "mfu_3x": round(3 * fwd_flops / (ms / 1e3) / PEAK_BF16, 4)}
    print("step", out["step"], flush=True)

    rec = {"ts": round(time.time(), 1), "stage": "train_prof",
           "batch": nq, **out}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
