"""Vector codecs: int8 scalar quantization, PQ, OPQ, PCA, pHash."""

from cvt_tpu.quant.sq import ScalarQuantizer
from cvt_tpu.quant.pq import ProductQuantizer
from cvt_tpu.quant.opq import OPQ
from cvt_tpu.quant.pca import PCA

__all__ = ["ScalarQuantizer", "ProductQuantizer", "OPQ", "PCA"]
