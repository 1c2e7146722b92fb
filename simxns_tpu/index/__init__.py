from simxns_tpu.index.engine import MIPSIndex, CorpusEncoder, RetrievalEngine, reform_out

__all__ = ["MIPSIndex", "CorpusEncoder", "RetrievalEngine", "reform_out"]
