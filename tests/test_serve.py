import numpy as np
import jax

from simxns_tpu.models import BiEncoder, BiEncoderConfig, BertConfig
from simxns_tpu.data import HashTokenizer
from simxns_tpu.parallel import create_mesh
from simxns_tpu.serve import DenseRetriever
import jax.numpy as jnp


def test_dense_retriever_end_to_end():
    mesh = create_mesh()
    tok = HashTokenizer(vocab_size=1024)
    cfg = BiEncoderConfig(bert=BertConfig.tiny(vocab_size=1024),
                          share_weight=True)
    model = BiEncoder(cfg)
    dummy = np.ones((2, 8), np.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy),
                        dummy, np.ones_like(dummy))

    passages = {i: (f"passage body token{i} content", f"title {i}")
                for i in range(40)}
    r = DenseRetriever(model, params, tok, mesh, max_q_length=12,
                       max_ctx_length=24, block_size=16, encode_chunk=16,
                       index_mode="exact")
    # exact-mode on CPU mesh needs f32 storage for tiny-scale determinism
    r.index.store_dtype = jnp.float32
    n = r.index_corpus(passages)
    assert n == 40

    # shared-tower verbatim query retrieves its own passage first
    hits = r.search(["title 7 passage body token7 content"], k=5)
    assert len(hits) == 1 and len(hits[0]) == 5
    top = hits[0][0]
    assert top.passage_id == 7
    assert top.title == "title 7"
    assert top.score >= hits[0][1].score

    # batch of queries, odd count (padding path)
    batch_hits = r.search([f"title {i} passage body token{i} content"
                           for i in (3, 11, 29)], k=3)
    assert [h[0].passage_id for h in batch_hits] == [3, 11, 29]

    # re-index invalidates the fused search executables: the new corpus's
    # live row count must be visible even when the padded index shape is
    # unchanged (valid_n is baked in at trace time)
    passages2 = {i: (f"fresh doc token{i + 100} text", f"t {i}")
                 for i in range(48)}
    assert r.index_corpus(passages2) == 48
    hits2 = r.search(["t 45 fresh doc token145 text"], k=5)
    assert hits2[0][0].passage_id == 45


def test_search_before_index_raises():
    mesh = create_mesh()
    tok = HashTokenizer(vocab_size=512)
    model = BiEncoder(BiEncoderConfig(
        bert=BertConfig.tiny(vocab_size=512), share_weight=True))
    dummy = np.ones((2, 8), np.int32)
    params = model.init(jax.random.PRNGKey(1), dummy, np.ones_like(dummy),
                        dummy, np.ones_like(dummy))
    r = DenseRetriever(model, params, tok, mesh, max_q_length=12,
                       max_ctx_length=24, block_size=16, encode_chunk=16)
    import pytest

    with pytest.raises(RuntimeError, match="index not built"):
        r.search(["anything"], k=3)


def test_from_checkpoint_roundtrip(tmp_path):
    from simxns_tpu.train import TrainState, make_adamw
    from simxns_tpu.io import save_checkpoint

    mesh = create_mesh()
    tok = HashTokenizer(vocab_size=512)
    cfg = BiEncoderConfig(bert=BertConfig.tiny(vocab_size=512),
                          share_weight=True)
    model = BiEncoder(cfg)
    dummy = np.ones((2, 8), np.int32)
    params = model.init(jax.random.PRNGKey(3), dummy, np.ones_like(dummy),
                        dummy, np.ones_like(dummy))
    tx = make_adamw(1e-3, total_steps=0)
    state = TrainState.create(params, tx)
    save_checkpoint(str(tmp_path), state, 7)

    zero = TrainState.create(jax.tree.map(jnp.zeros_like, params), tx)
    r = DenseRetriever.from_checkpoint(
        str(tmp_path), 7, model, tok, zero, mesh=mesh, max_q_length=12,
        max_ctx_length=24, block_size=16, encode_chunk=16, index_mode="exact")
    r.index.store_dtype = jnp.float32
    passages = {i: (f"body token{i}", f"t{i}") for i in range(20)}
    r.index_corpus(passages)
    hits = r.search(["t 4 body token4"], k=3)
    assert hits[0][0].passage_id == 4
