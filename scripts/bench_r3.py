"""Round-3 measurement battery: the TRAIN path + the composed iteration.

VERDICT r2 next-round #1: "measure — then speed — the full AR2 iteration
envelope on-chip" with the train share as the frontier (isolated r2 number:
batch-512 contrastive = 656 ms/step = 780 ex/s/chip ~= 32% MFU), and #2's
reproducibility discipline (medians, spreads, one process per stage — the
r2 in-bench train stage read 3x worse than isolated in the same process).

    python scripts/bench_r3.py train       # step-variant A/B battery
    python scripts/bench_r3.py ar2         # AR2 retriever step (recipe shape)
    python scripts/bench_r3.py ce          # grouped reranker step
    python scripts/bench_r3.py envelope    # 2000-step + 8.8M-mine composition
    python scripts/bench_r3.py rerank      # CE rerank S=192 fused vs XLA

Each stage appends one JSON line to bench_r3_results.jsonl. Run stages in
SEPARATE processes (one TPU process at a time on this relay).

Timing discipline (CLAUDE.md): warm 2 calls, time K calls in one async
burst, force with np.asarray of a device output — never block_until_ready.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

PEAK_BF16 = 197e12
RESULTS = "/root/repo/bench_r3_results.jsonl"
SMOKE = False  # set by --cpu: tiny shapes, flow-check only


def emit(rec):
    rec = {"ts": round(time.time(), 1), **rec}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(rec), flush=True)


def bert_flops(tokens, s_attn_tokens, L=12, H=768, F=3072, S=128):
    """fwd FLOPs: per-token GEMMs + attention score/value matmuls."""
    per_tok = L * 2 * (4 * H * H + 2 * H * F)
    attn = L * 2 * 2 * S * S * H  # per sequence pair of matmuls
    return tokens * per_tok + s_attn_tokens * attn


def _train_batch(rng, nq=512, lq=32, lc=128, vocab=30000):
    q = rng.integers(5, vocab, size=(nq, lq)).astype(np.int32)
    c = rng.integers(5, vocab, size=(nq, lc)).astype(np.int32)
    return {
        "q_ids": q, "q_mask": np.ones_like(q),
        "ctx_ids": c, "ctx_mask": np.ones_like(c),
        "positive_idx": np.arange(nq, dtype=np.int32),
    }


def _time_steps(step, state, extra, batch, k=8, warm=2):
    """Median ms/step over k timed steps (after warm), forced transfer."""
    import jax

    for _ in range(warm):
        state, m = step(state, *extra, batch)
    np.asarray(m["loss"])
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(k):
            state, m = step(state, *extra, batch)
        np.asarray(m["loss"])                  # force the whole burst
        times.append((time.time() - t0) / k)
    return float(np.median(times)) * 1000, state


def stage_train(args):
    """Batch-512 in-batch contrastive step: remat/policy/ffn variants."""
    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_biencoder_step

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    nq = args.batch
    batch = _train_batch(rng, nq=nq)
    variants = {
        "remat": dict(remat=True),
        "dots": dict(remat=True, remat_policy="dots"),
        "noremat": dict(remat=False),
        "remat_fusedffn": dict(remat=True, ffn_impl="fused"),
        "dots_fusedffn": dict(remat=True, remat_policy="dots",
                              ffn_impl="fused"),
        # grouped Pallas attention under grad: the r3 ablation attributed
        # 1/3 of fwd+bwd time to the XLA attention core (3% of FLOPs);
        # the grouped kernel's fused fwd+bwd re-tested for TRAINING
        # (the round-2 null was encode/fwd-only)
        "noremat_group": dict(remat=False),
        "remat_group": dict(remat=True),
        # tanh GELU (BertConfig.gelu): erf transcendentals measured ~9% of
        # tower fwd+bwd (ablate_tower gelutanh)
        "noremat_tanh": dict(remat=False, gelu="tanh"),
        "noremat_group_tanh": dict(remat=False, gelu="tanh"),
        # candidate (c): full-Pallas custom-VJP FFN (fwd saves g/gelu'
        # residuals; bwd = dx/dh kernel + dW accumulation kernel)
        "noremat_fusedvjp": dict(remat=False, ffn_impl="fused_vjp"),
    }
    sel = args.variants.split(",") if args.variants else list(variants)
    fwd_flops = bert_flops(nq * (32 + 128), 2 * nq)
    out = {}
    import simxns_tpu.ops.flash_attention as fa

    def run_parts():
        """fwd-only / fwd+bwd(no optimizer) split of the noremat step —
        attributes the full-step gap vs the ~0.58 pure-GEMM ceiling."""
        import optax
        from simxns_tpu.losses import in_batch_nll

        cfg = (BertConfig.tiny(vocab_size=30522) if SMOKE
               else BertConfig(dtype=jnp.bfloat16, remat=False))
        model = BiEncoder(BiEncoderConfig(bert=cfg))
        params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                            batch["q_mask"][:2], batch["ctx_ids"][:2],
                            batch["ctx_mask"][:2])
        state = TrainState.create(params, make_adamw(1e-5, total_steps=0))
        dev = shard_batch(batch, mesh)

        def loss_fn(p, b):
            q_emb, ctx_emb = model.apply(p, b["q_ids"], b["q_mask"],
                                         b["ctx_ids"], b["ctx_mask"],
                                         deterministic=True)
            loss, _ = in_batch_nll(q_emb, ctx_emb, b["positive_idx"])
            return loss

        kw = {}
        if mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            from simxns_tpu.parallel.mesh import dp_axes
            kw = {"in_shardings": (
                NamedSharding(mesh, PartitionSpec()),
                NamedSharding(mesh, PartitionSpec(dp_axes(mesh))))}
        fwd_j = jax.jit(loss_fn, **kw)

        @partial(jax.jit, **kw)
        def grad_j(p, b):
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            return loss + 1e-30 * optax.global_norm(grads)

        for label, f in (("fwdonly", fwd_j), ("gradonly", grad_j)):
            def pstep(state, b, f=f):
                return state, {"loss": f(state.params, b)}
            ms, _ = _time_steps(pstep, state, (), dev, k=args.k)
            mult = 1 if label == "fwdonly" else 3
            out[label] = {"ms": round(ms, 1),
                          f"mfu_{mult}x": round(
                              mult * fwd_flops / (ms / 1000) / PEAK_BF16, 4)}
            print(f"  {label}: {out[label]}", flush=True)

    for name in sel:
        if name == "parts":
            try:
                run_parts()
            except Exception as e:  # noqa: BLE001
                out["parts"] = {"error": str(e)[:200]}
            continue
        kw = variants[name]
        fa.SMALL_S_IMPL = "group" if name.endswith("_group") else "xla"
        cfg = (BertConfig.tiny(vocab_size=30522).replace(**kw) if SMOKE
               else BertConfig(dtype=jnp.bfloat16, **kw))
        model = BiEncoder(BiEncoderConfig(bert=cfg))
        params = model.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                            batch["q_mask"][:2], batch["ctx_ids"][:2],
                            batch["ctx_mask"][:2])
        tx = make_adamw(1e-5, total_steps=0)
        state = TrainState.create(params, tx)
        step = make_biencoder_step(model, tx, mesh, grad_mode="full")
        dev = shard_batch(batch, mesh)
        try:
            ms, state = _time_steps(step, state, (), dev, k=args.k)
            mfu3 = 3 * fwd_flops / (ms / 1000) / PEAK_BF16
            out[name] = {"ms_per_step": round(ms, 1),
                         "ex_per_s": round(nq / (ms / 1000), 1),
                         "mfu_3x": round(mfu3, 4)}
            print(f"  {name}: {ms:.1f} ms/step, {nq / (ms / 1000):.0f} ex/s,"
                  f" MFU(3x fwd) {mfu3:.3f}", flush=True)
        except Exception as e:  # OOM etc.: record the null
            out[name] = {"error": str(e)[:200]}
            print(f"  {name}: FAILED {str(e)[:120]}", flush=True)
        del state, step, params
    emit({"stage": "train_battery", "batch": nq, "variants": out})


def stage_ar2(args):
    """AR2 retriever step at the recipe working shape (B=64, 1+15 negs)."""
    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import (
        BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder,
        CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (
        TrainState, make_adamw, make_ar2_retriever_step)

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    n, m, lq, lc, lj = ((8, 4, 16, 32, 48) if SMOKE else
                        (args.batch if args.batch != 512 else 64,
                         16, 32, 128, 160))
    q = rng.integers(5, 30000, size=(n, lq)).astype(np.int32)
    c = rng.integers(5, 30000, size=(n * m, lc)).astype(np.int32)
    j = rng.integers(5, 30000, size=(n, m, lj)).astype(np.int32)
    batch = {"q_ids": q, "q_mask": np.ones_like(q),
             "ctx_ids": c, "ctx_mask": np.ones_like(c),
             "joint_ids": j, "joint_mask": np.ones_like(j)}
    dev = shard_batch(batch, mesh)
    # ';'-separated variant sets run back-to-back in ONE process so relay
    # session variance cancels (the fast-teacher A/B needs this).
    for variants in (args.variants or "").split(";"):
        de_kw = {"remat": True}
        if "dots" in variants:
            de_kw["remat_policy"] = "dots"
        if "noremat" in variants:
            de_kw = {"remat": False}
        if "fusedvjp" in variants:
            de_kw["ffn_impl"] = "fused_vjp"
        de_cfg = (BertConfig.tiny(vocab_size=30522) if SMOKE
                  else BertConfig(dtype=jnp.bfloat16, **de_kw))
        if SMOKE:
            ce_cfg = BertConfig.tiny(vocab_size=30522)
        else:
            ce_cfg = BertConfig(num_layers=24, hidden_size=1024,
                                num_heads=16, intermediate_size=4096,
                                dtype=jnp.bfloat16, remat=True)
        # "int8teacher": frozen-teacher fwd (~59% of step FLOPs) through
        # the whole-layer fused int8 view — the step factory never
        # differentiates ce_model, so the encode-only composition is legal.
        if "int8teacher" in variants:
            ce_cfg = ce_cfg.replace(layer_impl="fused_int8")
        try:
            de = BiEncoder(BiEncoderConfig(bert=de_cfg))
            ce = CrossEncoder(CrossEncoderConfig(bert=ce_cfg))
            de_p = de.init(jax.random.PRNGKey(0), q[:2],
                           batch["q_mask"][:2], c[:2], batch["ctx_mask"][:2])
            ce_p = ce.init(jax.random.PRNGKey(1), j.reshape(n * m, lj)[:2],
                           np.ones((2, lj), np.int32))
            tx = make_adamw(1e-5, total_steps=0)
            state = TrainState.create(de_p, tx)
            step = make_ar2_retriever_step(de, ce, tx, mesh, adv_lambda=0.0)
            ce_p = jax.device_put(ce_p)
            ms, state = _time_steps(step, state, (ce_p,), dev, k=args.k)
        except Exception as e:  # noqa: BLE001 — record compile failures
            emit({"stage": "ar2_step", "shape": [n, m, lq, lc, lj],
                  "variant": variants or "remat", "error": str(e)[:200]})
            continue
        # flops: DE fwd+bwd (3x) over q+ctx tokens + frozen CE-large fwd
        de_fwd = bert_flops(n * lq + n * m * lc, n + n * m)
        ce_fwd = bert_flops(n * m * lj, n * m, L=24, H=1024, F=4096, S=lj)
        mfu = (3 * de_fwd + ce_fwd) / (ms / 1000) / PEAK_BF16
        emit({"stage": "ar2_step", "shape": [n, m, lq, lc, lj],
              "variant": variants or "remat",
              "ms_per_step": round(ms, 1),
              "q_per_s": round(n / (ms / 1000), 1), "mfu": round(mfu, 4)})


def stage_ce(args):
    """Grouped reranker (CE-large) step at recipe shape."""
    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import BertConfig, CrossEncoder, CrossEncoderConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_reranker_step

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    n, m, lj = ((8, 4, 48) if SMOKE else
                (args.batch if args.batch != 512 else 64, 16, 160))
    j = rng.integers(5, 30000, size=(n, m, lj)).astype(np.int32)
    batch = {"joint_ids": j, "joint_mask": np.ones_like(j)}
    kw = {"remat": True}
    if args.variants and "dots" in args.variants:
        kw["remat_policy"] = "dots"
    if args.variants and "noremat" in args.variants:
        kw = {"remat": False}
    if args.variants and "fusedvjp" in args.variants:
        kw["ffn_impl"] = "fused_vjp"
    if SMOKE:
        cfg = BertConfig.tiny(vocab_size=30522)
    else:
        cfg = BertConfig(num_layers=24, hidden_size=1024, num_heads=16,
                         intermediate_size=4096, dtype=jnp.bfloat16, **kw)
    ce = CrossEncoder(CrossEncoderConfig(bert=cfg))
    p = ce.init(jax.random.PRNGKey(0), j.reshape(n * m, lj)[:2],
                np.ones((2, lj), np.int32))
    tx = make_adamw(1e-6, total_steps=0)
    state = TrainState.create(p, tx)
    step = make_reranker_step(ce, tx, mesh, group_size=m)
    dev = shard_batch(batch, mesh)
    ms, state = _time_steps(step, state, (), dev, k=args.k)
    fwd = bert_flops(n * m * lj, n * m, L=24, H=1024, F=4096, S=lj)
    emit({"stage": "ce_step", "shape": [n, m, lj],
          "variant": args.variants or "remat",
          "ms_per_step": round(ms, 1),
          "mfu": round(3 * fwd / (ms / 1000) / PEAK_BF16, 4)})


def stage_envelope(args):
    """The composed AR2 iteration: 2000 recipe train steps + one 8.8M mine.

    The only end-to-end number the 2x north star can be judged on
    (SimANS/train_NQ_AR2.sh iteration structure; mine anchor = the
    reference's 'Evaluation 3h' = 8.8M/8 A100s/3h ~= 102 p/s/A100).
    Train steps are measured live (steady-state); the mine side reuses
    bench.py's measured composition at the same working point.
    """
    import subprocess

    # 1) steady-state AR2-iteration step times at the PER-CHIP batch share
    # (the recipe's global batch 64 spans 8 devices — 8 queries/chip, the
    # same accounting as the 8-A100 reference; the CE-large step at the
    # full global batch does not fit one chip even with remat)
    env = dict(os.environ)
    de_ms = ce_ms = None
    for stage, var in (("ar2", args.variants), ("ce", args.variants)):
        cmd = [sys.executable, __file__, stage, "--k", str(args.k),
               "--batch", "8"]
        if var:
            cmd += ["--variants", var]
        subprocess.run(cmd, check=True, env=env)
    with open(RESULTS) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") == "ar2_step":
                de_ms = rec["ms_per_step"]
            if rec.get("stage") == "ce_step":
                ce_ms = rec["ms_per_step"]
    # 2) the mine phase at the 8.8M working point (bench.py, own process)
    out = subprocess.run([sys.executable, "/root/repo/bench.py"],
                         capture_output=True, text=True, env=env)
    mine = json.loads(out.stdout.strip().splitlines()[-1])
    mine_s_1chip = 8_800_000 / mine["value"]
    mine_s_8chip = mine_s_1chip / 8          # row-sharded index + dp encode
    # reference window: 2000 steps, 500 of them reranker
    #   (train_NQ_AR2.sh iteration_step=2000, iteration_reranker_step=500);
    # step times above are the per-chip batch share = v5e-8 wall-clock
    # (modulo grad-psum, which rides ICI)
    train_s = (1500 * de_ms + 500 * ce_ms) / 1000
    total_8 = train_s + mine_s_8chip
    # A100 anchor: mine "Evaluation 3h" on the SAME 8-device footing; the
    # train side has NO published number (BASELINE.md) — report the split.
    emit({"stage": "iteration_envelope",
          "variant": args.variants or "remat",
          "de_step_ms_chipshare": de_ms, "ce_step_ms_chipshare": ce_ms,
          "train_window_s": round(train_s, 1),
          "mine_s_v5e8": round(mine_s_8chip, 1),
          "mine_s_v5e1": round(mine_s_1chip, 1),
          "iteration_wall_clock_s_v5e8": round(total_8, 1),
          "train_share": round(train_s / total_8, 3),
          "a100_mine_anchor_s": 3 * 3600,
          "iteration_vs_a100_mine_only": round(3 * 3600 / mine_s_8chip, 1),
          "mine_vs_a100_per_chip": mine["vs_baseline"],
          "bench_value_per_chip": mine["value"]})


def stage_pretrain(args):
    """MASTER Condenser 8-loss pretrain step at the recipe working point
    (BERT-base, S=128, 2-layer heads — MasterPretrainConfig; global batch
    512 = 64/chip on the 8-chip footing). Composes with the collator
    throughput number (7.2k ex/s/core): is pretraining device- or
    collator-bound on one chip?"""
    import jax
    import jax.numpy as jnp

    from simxns_tpu.data import CondenserCollator, HashTokenizer, TokenMeta
    from simxns_tpu.models import BertConfig, Condenser, CondenserConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_condenser_step

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    b, s = ((8, 32) if SMOKE else
            (args.batch if args.batch != 512 else 64, 128))
    vocab = 256 if SMOKE else 30522
    tok = HashTokenizer(vocab_size=vocab)
    coll = CondenserCollator(TokenMeta.for_hash_tokenizer(tok),
                             max_seq_length=s, seed=1)
    examples = [{
        "text": rng.integers(5, vocab - 5, size=s - 8).tolist(),
        "queries": [rng.integers(5, vocab - 5, size=8).tolist()
                    for _ in range(2)],
        "next": [rng.integers(5, vocab - 5, size=s // 2).tolist()],
    } for _ in range(b)]
    t0 = time.time()
    batch = coll(examples)
    collate_s = time.time() - t0
    cfg = (BertConfig.tiny(vocab_size=vocab, max_position_embeddings=64)
           if SMOKE else BertConfig(dtype=jnp.bfloat16))
    model = Condenser(CondenserConfig(bert=cfg, n_head_layers=2))
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:2] for k, v in batch.items()})
    tx = make_adamw(1e-4, total_steps=0)
    state = TrainState.create(params, tx)
    step = make_condenser_step(model, tx, mesh)
    dev = shard_batch(batch, mesh)
    ms, state = _time_steps(step, state, (), dev, k=args.k)
    # fwd FLOPs, coarse: 3 encoder MLM passes + 5 x 2-layer decoder heads
    # (10/12 of one pass) + 8 vocab projections (modeling.py:53-160 shape)
    h, v = cfg.hidden_size, vocab
    enc = bert_flops(b * s, b, L=cfg.num_layers, H=h,
                     F=cfg.intermediate_size, S=s)
    fwd = 3 * enc + (10 / cfg.num_layers) * enc + 8 * b * s * 2 * h * v
    emit({"stage": "pretrain_step", "batch": b, "seq": s,
          "ms_per_step": round(ms, 1),
          "ex_per_s": round(b / (ms / 1000), 1),
          "collate_ms_per_batch": round(collate_s * 1000, 1),
          "mfu_3x": round(3 * fwd / (ms / 1000) / PEAK_BF16, 4)})


def stage_lead(args):
    """LEAD 4-component joint step at the published recipe shape
    (distill_from_12ce_to_6de.sh: 6-layer shared-tower student + 12-layer
    per-layer-logits CE, BOTH trained, 3 distilled layers, joint len 160,
    global batch 64 = 8/chip)."""
    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import (
        BiEncoder, BiEncoderConfig, BertConfig, CrossEncoder,
        CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (
        LeadConfig, TrainState, make_adamw, make_lead_step)

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    n, m, lq, lc, lj = ((8, 2, 8, 16, 24) if SMOKE else
                        (args.batch if args.batch != 512 else 8,
                         2, 32, 128, 160))
    q = rng.integers(5, 30000, size=(n, lq)).astype(np.int32)
    c = rng.integers(5, 30000, size=(n * m, lc)).astype(np.int32)
    j = rng.integers(5, 30000, size=(n, m, lj)).astype(np.int32)
    batch = {"q_ids": q, "q_mask": np.ones_like(q),
             "ctx_ids": c, "ctx_mask": np.ones_like(c),
             "positive_idx": (np.arange(n) * m).astype(np.int32),
             "joint_ids": j, "joint_mask": np.ones_like(j)}
    kw = {} if SMOKE else {"dtype": jnp.bfloat16}
    db_cfg = (BertConfig.tiny(vocab_size=30522) if SMOKE
              else BertConfig(num_layers=6, **kw))
    ce_cfg = (BertConfig.tiny(vocab_size=30522) if SMOKE
              else BertConfig(**kw))
    db = BiEncoder(BiEncoderConfig(bert=db_cfg, share_weight=True))
    ce = CrossEncoder(CrossEncoderConfig(bert=ce_cfg, per_layer_logits=True))
    tx = make_adamw(5e-5, total_steps=0)
    states = {
        "db": TrainState.create(db.init(
            jax.random.PRNGKey(0), q[:2], batch["q_mask"][:2], c[:2],
            batch["ctx_mask"][:2]), tx),
        "ce": TrainState.create(ce.init(
            jax.random.PRNGKey(1), j.reshape(n * m, lj)[:2],
            np.ones((2, lj), np.int32)), tx),
    }
    lcfg = LeadConfig(distill_db=True, distill_ce=True, train_db=True,
                      train_ce=True, layer_score=True, reweight=True,
                      layer_temperature=10.0)
    nsel = 1 if SMOKE else 3
    step = make_lead_step({"db": db, "ce": ce}, {"db": tx, "ce": tx},
                          mesh, lcfg, num_distill_layers=nsel)
    dev = shard_batch(batch, mesh)
    sel_s = jnp.arange(nsel, dtype=jnp.int32)
    sel_t = jnp.arange(nsel, dtype=jnp.int32) * 2 + 1

    def step2(states_, batch_):
        return step(states_, batch_, sel_s, sel_t)

    ms, states = _time_steps(step2, states, (), dev, k=args.k)
    db_fwd = bert_flops(n * lq + n * m * lc, n + n * m, L=6)
    ce_fwd = bert_flops(n * m * lj, n * m, S=lj)
    mfu = 3 * (db_fwd + ce_fwd) / (ms / 1000) / PEAK_BF16
    emit({"stage": "lead_step", "shape": [n, m, lq, lc, lj],
          "ms_per_step": round(ms, 1),
          "q_per_s": round(n / (ms / 1000), 1), "mfu": round(mfu, 4)})


def stage_rerank(args):
    """CE rerank forward at S=192: whole-layer fused int8 vs XLA bf16.

    VERDICT r2 #6: CE forward dominates reranker eval ('this step will
    take a lot of time', PROD/README.md:345). B joint rows of S=192
    through a 12-layer CE; p/s for both impls + CLS-score cosine check.
    """
    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import BertConfig, CrossEncoder, CrossEncoderConfig
    from simxns_tpu.evals.rerank import rerank_topk

    rng = np.random.default_rng(0)
    s = args.seq
    nb, b = (2, 8) if SMOKE else (16, 256)
    ids = rng.integers(5, 30000, size=(nb * b, s)).astype(np.int32)
    mask = np.ones_like(ids)
    res = {}
    p_xla = None
    for name, kw in (("xla", {}), ("fused_int8",
                                   {"layer_impl": "fused_int8"})):
        cfg = (BertConfig.tiny(vocab_size=30522).replace(**kw) if SMOKE
               else BertConfig(dtype=jnp.bfloat16, **kw))
        ce = CrossEncoder(CrossEncoderConfig(bert=cfg))
        p = ce.init(jax.random.PRNGKey(0), ids[:2], mask[:2])
        if p_xla is None:
            p_xla = p
        else:
            p = p_xla          # same params: cosine check is meaningful

        @jax.jit
        def score(params, i, m):
            return ce.apply(params, i, m, deterministic=True)["logits"]

        score(p, ids[:b], mask[:b])
        outs = []
        times = []
        for _ in range(3):
            t0 = time.time()
            pend = [score(p, ids[k * b:(k + 1) * b], mask[k * b:(k + 1) * b])
                    for k in range(nb)]
            outs = [np.asarray(o, np.float32) for o in pend]
            times.append(time.time() - t0)
        t = float(np.median(times))
        res[name] = {"p_per_s": round(nb * b / t, 1),
                     "ms_per_256": round(t / nb * 1000, 2)}
        res[name]["logits"] = np.concatenate(outs)
        print(f"  {name}: {nb * b / t:.0f} joint/s", flush=True)
    a, c = res["xla"].pop("logits"), res["fused_int8"].pop("logits")
    # rank agreement: top-1 of each 16-group
    ga = a.reshape(-1, 16).argmax(1)
    gc = c.reshape(-1, 16).argmax(1)
    agree = float((ga == gc).mean())
    corr = float(np.corrcoef(a.ravel(), c.ravel())[0, 1])
    emit({"stage": "ce_rerank_s%d" % s, "xla": res["xla"],
          "fused_int8": res["fused_int8"],
          "speedup": round(res["fused_int8"]["p_per_s"]
                           / res["xla"]["p_per_s"], 3),
          "top1_agreement": round(agree, 4), "score_corr": round(corr, 4)})


def stage_ce_attrib(args):
    """Attribute the CE-large step's MFU gap (measured 0.40 vs the ~0.58
    pure-GEMM ceiling): fwd-only / fwd+bwd / +optimizer split, the gelu
    knob, and an S sweep — S=160 is an off-tile sequence length (128+32)
    and S=256 crosses the flash-attention dispatch boundary.

    Emits one ``ce_attrib`` line with a dict per variant; variants that
    fail (in-process error, hard OOM kill, or a killed hang) record their
    error string instead of silently dropping out of the merged record.

    Each variant runs in its OWN subprocess (fresh HBM). Measured round 3:
    the one-process battery OOM'd from the third variant on — every
    BERT-large noremat variant's params+opt+activations footprint is a
    large share of the 16G chip and jit caches pin buffers across
    variants. Sequential subprocesses isolate them; the relay's
    remote-compile cache keeps repeat compiles cheap.
    """
    labels = ["full160", "parts160", "tanh160", "full128", "full192",
              "full256_flash", "full256_xla"]
    only = os.environ.get("SIMXNS_CE_ATTRIB_ONLY")
    if only is None and not SMOKE:
        import subprocess

        t_start = time.time()
        rcs = {}
        for lab in labels:
            env = dict(os.environ, SIMXNS_CE_ATTRIB_ONLY=lab)
            rcs[lab] = subprocess.run(
                [sys.executable, __file__, "ce_attrib", "--k", str(args.k),
                 "--batch", str(args.batch)], env=env, check=False
            ).returncode
        merged, nm = {}, None
        with open(RESULTS) as f:
            for line in f:
                rec = json.loads(line)
                if (rec.get("stage") == "ce_attrib_part"
                        and rec["ts"] >= t_start):
                    nm = rec["shape_nm"]
                    merged.update({k: v for k, v in rec.items()
                                   if k not in ("ts", "stage", "shape_nm")})
        # a child that died without emitting (hard OOM kill, killed hang)
        # must still be visible in the merged record
        for lab in labels:
            if lab not in merged:
                merged[lab] = {"error": f"subprocess exit {rcs[lab]}, "
                                        "no ce_attrib_part emitted"}
        if all(isinstance(v, dict) and "error" in v
               for v in merged.values()):
            merged["error"] = "every variant subprocess failed"
        emit({"stage": "ce_attrib", "shape_nm": nm, **merged})
        return

    import jax
    import jax.numpy as jnp
    import optax

    from simxns_tpu.models import BertConfig, CrossEncoder, CrossEncoderConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_reranker_step

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    # n=8 is the recipe per-chip share (global batch 64 / 8 chips), the
    # same accounting as stage_ce — n=64 noremat BERT-large needs 112.9G
    # HBM and fails compile (measured; the HTTP 500s were compile OOMs).
    n, m = (8, 2) if SMOKE else (args.batch if args.batch != 512 else 8, 16)
    res = {}

    def make(lj, **cfg_kw):
        j = rng.integers(5, 30000, size=(n, m, lj)).astype(np.int32)
        batch = {"joint_ids": j, "joint_mask": np.ones_like(j)}
        cfg = (BertConfig.tiny(vocab_size=30522).replace(
                   **{k: v for k, v in cfg_kw.items()
                      if k in ("gelu", "attention_impl")}) if SMOKE else
               BertConfig(num_layers=24, hidden_size=1024, num_heads=16,
                          intermediate_size=4096, dtype=jnp.bfloat16,
                          remat=False, **cfg_kw))
        ce = CrossEncoder(CrossEncoderConfig(bert=cfg))
        p = ce.init(jax.random.PRNGKey(0), j.reshape(n * m, lj)[:2],
                    np.ones((2, lj), np.int32))
        state = TrainState.create(p, make_adamw(1e-6, total_steps=0))
        fwd = bert_flops(n * m * lj, n * m, L=cfg.num_layers,
                         H=cfg.hidden_size, F=cfg.intermediate_size, S=lj)
        return ce, state, shard_batch(batch, mesh), fwd

    def record(label, fn):
        if only is not None and label != only:
            return
        for attempt in (1, 2):
            try:
                fn()
                break
            except Exception as e:  # noqa: BLE001 — record compile failures
                res[label] = {"error": str(e)[:200]}
                # The relay's compile helpers restart occasionally
                # (Connection Failed / transient 500) — retry once.
                transient = ("Connection Failed" in str(e)
                             or "UNAVAILABLE" in str(e))
                if not transient or attempt == 2:
                    break
                time.sleep(30)
        print(f"  {label}: {res.get(label)}", flush=True)

    def full(label, lj, **cfg_kw):
        ce, state, dev, fwd = make(lj, **cfg_kw)
        tx = make_adamw(1e-6, total_steps=0)
        step = make_reranker_step(ce, tx, mesh, group_size=m)
        ms, _ = _time_steps(step, state, (), dev, k=args.k)
        res[label] = {"ms": round(ms, 1),
                      "joint_per_s": round(n * m / (ms / 1000), 1),
                      "mfu_3x": round(3 * fwd / (ms / 1000) / PEAK_BF16, 4)}

    def parts(lj):
        ce, state, dev, fwd = make(lj)

        def loss_fn(params, batch):
            nn, mm, ll = batch["joint_ids"].shape
            out = ce.apply(params, batch["joint_ids"].reshape(nn * mm, ll),
                           batch["joint_mask"].reshape(nn * mm, ll),
                           group_size=mm, deterministic=True)
            lg = out["logits"].astype(jnp.float32)
            return -jax.nn.log_softmax(lg, 1)[:, 0].mean()

        # Mesh-aware jit WITHOUT donation (state is reused across timed
        # calls); on a single-device mesh shardings are omitted (see
        # train.steps.sharding_kwargs for why).
        kw = {}
        if mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            from simxns_tpu.parallel.mesh import dp_axes
            repl = NamedSharding(mesh, PartitionSpec())
            shard = NamedSharding(mesh, PartitionSpec(dp_axes(mesh)))
            kw = {"in_shardings": (repl, shard)}
        fwd_j = jax.jit(loss_fn, **kw)

        @partial(jax.jit, **kw)
        def grad_j(params, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            # 1e-30 * global_norm keeps grads live in the output without
            # changing the reported loss (XLA cannot fold a data-dependent
            # term).
            return loss + 1e-30 * optax.global_norm(grads)

        def fwd_step(state, batch):
            return state, {"loss": fwd_j(state.params, batch)}

        def grad_step(state, batch):
            return state, {"loss": grad_j(state.params, batch)}

        ms, _ = _time_steps(fwd_step, state, (), dev, k=args.k)
        res[f"fwd{lj}"] = {"ms": round(ms, 1),
                           "mfu_1x": round(fwd / (ms / 1000) / PEAK_BF16, 4)}
        print(f"  fwd{lj}: {res[f'fwd{lj}']}", flush=True)
        ms, _ = _time_steps(grad_step, state, (), dev, k=args.k)
        res[f"grad{lj}"] = {"ms": round(ms, 1),
                            "mfu_3x": round(3 * fwd / (ms / 1000)
                                            / PEAK_BF16, 4)}

    record("full160", lambda: full("full160", 160))
    record("parts160", lambda: parts(160))
    record("tanh160", lambda: full("tanh160", 160, gelu="tanh"))
    for lj in (128, 192):
        record(f"full{lj}", lambda lj=lj: full(f"full{lj}", lj))
    record("full256_flash", lambda: full("full256_flash", 256))
    record("full256_xla",
           lambda: full("full256_xla", 256, attention_impl="xla"))
    emit({"stage": "ce_attrib_part" if only is not None else "ce_attrib",
          "shape_nm": [n, m], **res})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["train", "ar2", "ce", "envelope",
                                      "rerank", "pretrain", "lead",
                                      "ce_attrib"])
    ap.add_argument("--k", type=int, default=8, help="timed steps per rep")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq", type=int, default=192)
    ap.add_argument("--variants", default=None,
                    help="comma list for train battery / 'dots' for steps")
    ap.add_argument("--cpu", action="store_true",
                    help="flow smoke on the virtual CPU mesh (tiny shapes; "
                         "timings meaningless)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platform_name", "cpu")
        args.batch = min(args.batch, 16)
        args.seq = min(args.seq, 48)
        args.k = 2
        import simxns_tpu.ops.fused_layer as fl
        import simxns_tpu.ops.fused_ffn as ff

        fl.INTERPRET = ff.INTERPRET = True
        global SMOKE
        SMOKE = True
    {"train": stage_train, "ar2": stage_ar2, "ce": stage_ce,
     "envelope": stage_envelope, "rerank": stage_rerank,
     "pretrain": stage_pretrain, "lead": stage_lead,
     "ce_attrib": stage_ce_attrib}[args.stage](args)


if __name__ == "__main__":
    main()
