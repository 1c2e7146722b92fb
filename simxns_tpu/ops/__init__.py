from simxns_tpu.ops.attention import multi_head_attention
from simxns_tpu.ops.topk import exact_topk, blocked_mips_topk
from simxns_tpu.ops.mips_kernel import fused_mips_topk

__all__ = ["multi_head_attention", "exact_topk", "blocked_mips_topk",
           "fused_mips_topk"]
