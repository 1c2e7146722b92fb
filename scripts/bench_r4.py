"""Round-4 measurement battery: fast-teacher A/Bs + CE-shape attribution.

VERDICT r3 next-round items measured here:

  #6  --fast-teacher was wired for KD (run.py:973-979) and LEAD's frozen
      configurations (run.py:1230-1237) in round 3/4 but A/B-measured only
      for AR2 (1.38x). `kd_ab` and `lead_frozen_ab` apply the same
      discipline: both variants back-to-back in ONE process (the teacher
      params are shared; only the forward module changes), k timed steps,
      medians.
  #5  the CE-large step plateaus at 0.40 MFU at the recipe's S=160 joint
      length vs 0.59 measured at S=128 (bench_r3 ce_attrib full128) and
      the ~0.58 pure-GEMM ceiling. `ce_shape` probes whether S=160 (an
      off-tile 128+32 length) is the cause and whether PADDING the joint
      rows to a tile-friendly length is a net win despite the extra
      FLOPs: fwd-only at 128 vs 160, and remat/noremat step variants at
      S in {128, 160, 192} — each in its own subprocess (the r3 battery
      OOM'd from variant 3 on when one process pinned every jit cache).

    python scripts/bench_r4.py kd_ab            # KD step bf16 vs int8 teacher
    python scripts/bench_r4.py lead_frozen_ab   # LEAD frozen-CE bf16 vs int8
    python scripts/bench_r4.py ce_shape         # S-padding attribution sweep
    python scripts/bench_r4.py all --cpu        # tiny-shape flow check

Each stage appends one JSON line to bench_r4_results.jsonl. Run TPU stages
in SEPARATE processes (one TPU process at a time on this relay). Timing
discipline per CLAUDE.md: warm, burst, force with np.asarray.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

PEAK_BF16 = 197e12
RESULTS = "/root/repo/bench_r4_results.jsonl"
SMOKE = False


def emit(rec):
    rec = {"ts": round(time.time(), 1), **rec}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(rec), flush=True)


def bert_flops(tokens, s_attn_tokens, L=12, H=768, F=3072, S=128):
    per_tok = L * 2 * (4 * H * H + 2 * H * F)
    attn = L * 2 * 2 * S * S * H
    return tokens * per_tok + s_attn_tokens * attn


def _grouped_batch(rng, n, m, lq, lc, lj, vocab=30000):
    """The PROD/LEAD joint-batch layout (data/datasets.py): grouped ctx
    rows [n*m, lc] + per-group joint rows [n, m, lj]."""
    q = rng.integers(5, vocab, size=(n, lq)).astype(np.int32)
    c = rng.integers(5, vocab, size=(n * m, lc)).astype(np.int32)
    j = rng.integers(5, vocab, size=(n, m, lj)).astype(np.int32)
    return {"q_ids": q, "q_mask": np.ones_like(q),
            "ctx_ids": c, "ctx_mask": np.ones_like(c),
            "joint_ids": j, "joint_mask": np.ones_like(j),
            "positive_idx": (np.arange(n, dtype=np.int32) * m)}


def _time_burst(fn, k=8, warm=2):
    """Median ms over 3 bursts of k calls (tiny-slice force)."""
    import jax

    out = None
    for _ in range(warm):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(k):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append((time.time() - t0) / k)
    return float(np.median(ts)) * 1000


def stage_kd_ab(args):
    """PROD KD step (cross_encoder teacher mode, run.py run_kd shapes:
    6L student DE, 12L CE teacher, group 8, joint 160, chip-share batch 8)
    x {bf16 teacher, fused-int8 teacher view} back-to-back.

    The teacher forward is ~2/3 of step FLOPs (12L x 8 joint rows at
    S=160 vs 6L student towers) and is frozen (stop_gradient) — exactly
    the shape the whole-layer int8 kernel was built for
    (run_progressive_distill_marco.py:204-318 frozen teacher forwards).
    """
    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import (
        BertConfig, BiEncoder, BiEncoderConfig, CrossEncoder,
        CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_kd_step

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    if SMOKE:
        n, m, lq, lc, lj = 8, 2, 8, 16, 24
        s_cfg = BertConfig.tiny(vocab_size=30522)
        t_cfg = BertConfig.tiny(vocab_size=30522)
    else:
        n, m, lq, lc, lj = args.batch, 8, 32, 128, 160
        s_cfg = BertConfig(num_layers=6, dtype=jnp.bfloat16, remat=False)
        t_cfg = BertConfig(num_layers=12, dtype=jnp.bfloat16, remat=False)
    batch = shard_batch(_grouped_batch(rng, n, m, lq, lc, lj), mesh)
    student = BiEncoder(BiEncoderConfig(bert=s_cfg))
    teacher = CrossEncoder(CrossEncoderConfig(bert=t_cfg))
    s_params = student.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                            batch["q_mask"][:2], batch["ctx_ids"][:2],
                            batch["ctx_mask"][:2])
    t_params = teacher.init(jax.random.PRNGKey(1),
                            np.ones((2, lj), np.int32),
                            np.ones((2, lj), np.int32))
    teachers = {"ce": t_params}
    tx = make_adamw(2e-5, total_steps=0)
    # steps DONATE their state arg (CLAUDE.md) — the first variant's steps
    # delete the init buffers; snapshot to host and re-put per variant
    s_params_host = jax.device_get(s_params)
    # student fwd(x3 for bwd) + frozen teacher fwd(x1)
    stu = 3 * bert_flops(n * (lq + m * lc), n * (1 + m), L=6, S=lc)
    tea = bert_flops(n * m * lj, n * m, L=12, S=lj)
    out = {}
    for label, t_model in (
            ("bf16", teacher),
            ("int8_teacher", CrossEncoder(CrossEncoderConfig(
                bert=t_cfg.replace(layer_impl="fused_int8",
                                   ffn_impl="xla", proj_impl="xla"))))):
        if SMOKE and label == "int8_teacher":
            import simxns_tpu.ops.fused_layer as fl
            fl.INTERPRET = True
        step = make_kd_step(student, tx, mesh, "cross_encoder",
                            kd_type="KD_softmax",
                            ce_teacher_model=t_model)
        holder = {"s": TrainState.create(
            jax.device_put(s_params_host), tx)}

        def one():
            holder["s"], metr = step(holder["s"], teachers, batch)
            return metr["loss"]

        ms = _time_burst(one, k=args.k)
        out[label] = {"ms_per_step": round(ms, 1),
                      "mfu": round((stu + tea) / (ms / 1e3) / PEAK_BF16, 4)}
        print(label, out[label], flush=True)
    emit({"stage": "kd_step_ab", "shape_nmlj": [n, m, lj],
          "speedup": round(out["bf16"]["ms_per_step"]
                           / out["int8_teacher"]["ms_per_step"], 3), **out})


def stage_lead_frozen_ab(args):
    """LEAD joint step in the FROZEN-teacher configuration
    (LeadRecipeConfig.train_ce=False; the reference wraps frozen models
    without DDP, LEAD/run_LEAD.py:65-73) x {bf16 CE, fused-int8 CE view}.

    Shapes per lead_ms_distill: 6L shared-weight student, 12L CE with
    per-layer logits, m=2 (1 negative), joint 160, chip-share batch 8.
    """
    import jax
    import jax.numpy as jnp

    from simxns_tpu.losses.lead import select_layers
    from simxns_tpu.models import (
        BertConfig, BiEncoder, BiEncoderConfig, CrossEncoder,
        CrossEncoderConfig)
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import (
        LeadConfig, TrainState, make_adamw, make_lead_step)

    mesh = create_mesh()
    rng_np = np.random.default_rng(0)
    if SMOKE:
        n, m, lq, lc, lj = 8, 2, 8, 16, 24
        db_cfg = BertConfig.tiny(vocab_size=30522)
        ce_cfg = BertConfig.tiny(vocab_size=30522)
    else:
        n, m, lq, lc, lj = args.batch, 2, 32, 128, 160
        db_cfg = BertConfig(num_layers=6, dtype=jnp.bfloat16, remat=False)
        ce_cfg = BertConfig(num_layers=12, dtype=jnp.bfloat16, remat=False)
    batch = shard_batch(_grouped_batch(rng_np, n, m, lq, lc, lj), mesh)
    db = BiEncoder(BiEncoderConfig(bert=db_cfg, share_weight=True))
    ce = CrossEncoder(CrossEncoderConfig(bert=ce_cfg, per_layer_logits=True))
    db_params = db.init(jax.random.PRNGKey(0), batch["q_ids"][:2],
                        batch["q_mask"][:2], batch["ctx_ids"][:2],
                        batch["ctx_mask"][:2])
    ce_params = ce.init(jax.random.PRNGKey(1), np.ones((2, lj), np.int32),
                        np.ones((2, lj), np.int32))
    tx_db = make_adamw(5e-5, total_steps=0)
    tx_ce = make_adamw(5e-5, total_steps=0)
    cfg = LeadConfig(distill_db=True, distill_ce=True, train_db=True,
                     train_ce=False, layer_score=True, reweight=True,
                     layer_temperature=10.0)
    k_layers = min(3, db_cfg.num_layers, ce_cfg.num_layers)
    sel_s, sel_t = select_layers(rng_np, db_cfg.num_layers,
                                 ce_cfg.num_layers, k_layers, "random")
    sel_s = np.asarray(sel_s, np.int32)
    sel_t = np.asarray(sel_t, np.int32)
    # steps donate their states (CLAUDE.md) — snapshot for the 2nd variant
    db_host = jax.device_get(db_params)
    ce_host = jax.device_get(ce_params)
    stu = 3 * bert_flops(n * (lq + m * lc), n * (1 + m), L=6, S=lc)
    tea = bert_flops(n * m * lj, n * m, L=12, S=lj)
    out = {}
    for label, views in (
            ("bf16", None),
            ("int8_teacher", {"ce": CrossEncoder(CrossEncoderConfig(
                bert=ce_cfg.replace(layer_impl="fused_int8", ffn_impl="xla",
                                    proj_impl="xla"),
                per_layer_logits=True))})):
        if SMOKE and label == "int8_teacher":
            import simxns_tpu.ops.fused_layer as fl
            fl.INTERPRET = True
        step = make_lead_step({"db": db, "ce": ce},
                              {"db": tx_db, "ce": tx_ce}, mesh, cfg,
                              num_distill_layers=k_layers, frozen_views=views)
        holder = {"s": {"db": TrainState.create(
                            jax.device_put(db_host), tx_db),
                        "ce": TrainState.create(
                            jax.device_put(ce_host), tx_ce)}}

        def one():
            holder["s"], metr = step(holder["s"], batch, sel_s, sel_t)
            return metr["loss"]

        ms = _time_burst(one, k=args.k)
        out[label] = {"ms_per_step": round(ms, 1),
                      "mfu": round((stu + tea) / (ms / 1e3) / PEAK_BF16, 4)}
        print(label, out[label], flush=True)
    emit({"stage": "lead_frozen_ab", "shape_nmlj": [n, m, lj],
          "speedup": round(out["bf16"]["ms_per_step"]
                           / out["int8_teacher"]["ms_per_step"], 3), **out})


CE_SHAPE_LABELS = ["fwd128", "fwd160", "step160_noremat", "step192_noremat",
                   "step128_remat", "step160_remat", "step192_remat",
                   "step256_remat"]


def stage_ce_shape(args):
    """The S=160 attribution finish (VERDICT r3 weak #3 / next #5).

    Per-joint-row cost is what the padding decision needs: if a padded
    S=192 step costs LESS per row than the S=160 step despite 20% more
    FLOPs (S=192 is 128+64 — half-tile aligned on the 8x128 VPU lanes and
    a multiple of the MXU's 64-row half-pass; 160 = 128+32 is neither),
    the collator should pad joints to 192 on TPU. remat variants answer
    it for the memory-constrained regime (the continuous AR2 iteration
    runs the CE remat, run.py --remat ce); noremat for the bench regime.
    Each variant runs in its own subprocess (fresh HBM, r3 lesson).
    """
    only = os.environ.get("SIMXNS_CE_SHAPE_ONLY")
    if only is None and not SMOKE:
        import subprocess

        t_start = time.time()
        rcs = {}
        for lab in CE_SHAPE_LABELS:
            env = dict(os.environ, SIMXNS_CE_SHAPE_ONLY=lab)
            rcs[lab] = subprocess.run(
                [sys.executable, __file__, "ce_shape", "--k", str(args.k),
                 "--batch", str(args.batch)], env=env, check=False
            ).returncode
        merged = {}
        with open(RESULTS) as f:
            for line in f:
                rec = json.loads(line)
                if (rec.get("stage") == "ce_shape_part"
                        and rec["ts"] >= t_start):
                    merged.update({k: v for k, v in rec.items()
                                   if k not in ("ts", "stage")})
        for lab in CE_SHAPE_LABELS:
            if lab not in merged:
                merged[lab] = {"error": f"subprocess exit {rcs[lab]}, "
                                        "no ce_shape_part emitted"}
        if all(isinstance(v, dict) and "error" in v for v in merged.values()):
            merged["error"] = "every variant subprocess failed"
        emit({"stage": "ce_shape", "n_groups": args.batch, **merged})
        return

    import jax
    import jax.numpy as jnp

    from simxns_tpu.models import BertConfig, CrossEncoder, CrossEncoderConfig
    from simxns_tpu.parallel import create_mesh, shard_batch
    from simxns_tpu.train import TrainState, make_adamw, make_reranker_step

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    n, m = (8, 2) if SMOKE else (args.batch, 16)

    def make(lj, remat):
        j = rng.integers(5, 30000, size=(n, m, lj)).astype(np.int32)
        batch = {"joint_ids": j, "joint_mask": np.ones_like(j)}
        cfg = (BertConfig.tiny(vocab_size=30522) if SMOKE else
               BertConfig(num_layers=24, hidden_size=1024, num_heads=16,
                          intermediate_size=4096, dtype=jnp.bfloat16,
                          remat=remat))
        ce = CrossEncoder(CrossEncoderConfig(bert=cfg))
        p = ce.init(jax.random.PRNGKey(0), j.reshape(n * m, lj)[:2],
                    np.ones((2, lj), np.int32))
        fwd = bert_flops(n * m * lj, n * m, L=cfg.num_layers,
                         H=cfg.hidden_size, F=cfg.intermediate_size, S=lj)
        return ce, cfg, p, shard_batch(batch, mesh), fwd

    def record(label, fn):
        if only is not None and label != only:
            return
        try:
            res = fn()
        except Exception as e:  # OOM / compile failures stay visible
            res = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(label, res, flush=True)
        emit({"stage": "ce_shape_part", label: res})

    def fwd_only(lj):
        ce, cfg, p, batch, fwd = make(lj, remat=False)

        @jax.jit
        def f(p, b):
            n_, m_, lj_ = b["joint_ids"].shape
            out = ce.apply(p, b["joint_ids"].reshape(n_ * m_, lj_),
                           b["joint_mask"].reshape(n_ * m_, lj_),
                           group_size=m_, deterministic=True)
            return out["logits"]

        ms = _time_burst(lambda: f(p, batch), k=args.k)
        return {"ms": round(ms, 1),
                "mfu_1x": round(fwd / (ms / 1e3) / PEAK_BF16, 4),
                "us_per_row": round(ms * 1000 / (n * m), 1)}

    def full_step(lj, remat):
        ce, cfg, p, batch, fwd = make(lj, remat)
        tx = make_adamw(1e-6, total_steps=0)
        step = make_reranker_step(ce, tx, mesh, group_size=m)
        holder = {"s": TrainState.create(p, tx)}

        def one():
            holder["s"], metr = step(holder["s"], batch)
            return metr["loss"]

        ms = _time_burst(one, k=args.k)
        return {"ms": round(ms, 1),
                "mfu_3x": round(3 * fwd / (ms / 1e3) / PEAK_BF16, 4),
                "us_per_row": round(ms * 1000 / (n * m), 1)}

    record("fwd128", lambda: fwd_only(128))
    record("fwd160", lambda: fwd_only(160))
    record("step160_noremat", lambda: full_step(160, remat=False))
    record("step192_noremat", lambda: full_step(192, remat=False))
    record("step128_remat", lambda: full_step(128, remat=True))
    record("step160_remat", lambda: full_step(160, remat=True))
    record("step192_remat", lambda: full_step(192, remat=True))
    record("step256_remat", lambda: full_step(256, remat=True))


def main():
    global SMOKE
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["kd_ab", "lead_frozen_ab", "ce_shape",
                                      "all"])
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny shapes on the virtual CPU mesh (flow check)")
    args = ap.parse_args()
    if args.cpu:
        SMOKE = True
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device"
                                     "_count=8").strip()
        import jax

        jax.config.update("jax_platform_name", "cpu")
    stages = {"kd_ab": stage_kd_ab, "lead_frozen_ab": stage_lead_frozen_ab,
              "ce_shape": stage_ce_shape}
    if args.stage == "all":
        for fn in stages.values():
            fn(args)
    else:
        stages[args.stage](args)


if __name__ == "__main__":
    main()
