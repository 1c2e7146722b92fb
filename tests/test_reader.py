import numpy as np
import jax
import jax.numpy as jnp

from simxns_tpu.models import Reader, ReaderConfig, BertConfig, reader_loss

CFG = BertConfig.tiny(vocab_size=256)


def test_reader_shapes():
    rng = np.random.default_rng(0)
    n, m, l = 2, 3, 16
    ids = rng.integers(4, 256, size=(n, m, l)).astype(np.int32)
    mask = np.ones_like(ids)
    model = Reader(ReaderConfig(bert=CFG))
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    start, end, rank = model.apply(params, ids, mask)
    assert start.shape == (n, m, l) and end.shape == (n, m, l)
    assert rank.shape == (n, m)


def test_reader_loss_oracle():
    """Against a literal numpy transcription of compute_loss/_calc_mml."""
    rng = np.random.default_rng(1)
    n, m, l, a = 2, 2, 8, 2
    start_logits = rng.normal(size=(n, m, l)).astype(np.float32)
    end_logits = rng.normal(size=(n, m, l)).astype(np.float32)
    rel = rng.normal(size=(n, m)).astype(np.float32)
    # positive passage (col 0) carries spans; negatives have ignored (=l)
    sp = np.full((n, m, a), l, np.int32)
    ep = np.full((n, m, a), l, np.int32)
    am = np.zeros((n, m, a), np.int32)
    sp[:, 0, 0] = 2; ep[:, 0, 0] = 3; am[:, 0, 0] = 1
    sp[0, 0, 1] = 5; ep[0, 0, 1] = 5; am[0, 0, 1] = 1

    total, parts = reader_loss(
        jnp.asarray(start_logits), jnp.asarray(end_logits), jnp.asarray(rel),
        jnp.asarray(sp), jnp.asarray(ep), jnp.asarray(am))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    switch = -np.log(softmax(rel))[:, 0].sum()

    def ce(logits, pos):
        if pos >= l:
            return 0.0
        return -np.log(softmax(logits))[pos]

    loss_tensor = np.zeros((n, m, a))
    for i in range(n):
        for j in range(m):
            for k in range(a):
                if am[i, j, k]:
                    loss_tensor[i, j, k] = (
                        ce(start_logits[i, j], sp[i, j, k])
                        + ce(end_logits[i, j], ep[i, j, k]))
    lt = loss_tensor.max(axis=1)
    marg = np.sum(np.exp(-lt - 1e10 * (lt == 0)), axis=1)
    span = -np.sum(np.log(marg + (marg == 0)))
    np.testing.assert_allclose(float(parts["switch_loss"]), switch, rtol=1e-5)
    np.testing.assert_allclose(float(parts["span_loss"]), span, rtol=1e-5)
    np.testing.assert_allclose(float(total), span + switch, rtol=1e-5)


def test_reader_trains():
    rng = np.random.default_rng(2)
    n, m, l, a = 4, 2, 12, 1
    ids = rng.integers(4, 256, size=(n, m, l)).astype(np.int32)
    ids[:, 0, 5] = 7  # answer marker token in positive passages
    mask = np.ones_like(ids)
    sp = np.full((n, m, a), l, np.int32); sp[:, 0, 0] = 5
    ep = np.full((n, m, a), l, np.int32); ep[:, 0, 0] = 5
    am = np.zeros((n, m, a), np.int32); am[:, 0, 0] = 1

    import optax
    model = Reader(ReaderConfig(bert=CFG))
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(pp):
            s, e, r = model.apply(pp, ids, mask, deterministic=True)
            loss, _ = reader_loss(s, e, r, jnp.asarray(sp), jnp.asarray(ep),
                                  jnp.asarray(am))
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for _ in range(10):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    s, e, r = model.apply(params, ids, mask)
    # start prediction converges to position 5 on positive passages
    assert (np.argmax(np.asarray(s[:, 0]), -1) == 5).mean() >= 0.75
