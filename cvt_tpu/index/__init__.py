"""Search engines: exact flat scan, int8 SQ scan, flat ADC, IVF-ADC,
vocab-tree + Hamming embedding, and the native host-side HNSW graph."""

from cvt_tpu.index.flat import FlatIndex
from cvt_tpu.index.flat_sq import FlatSQIndex
from cvt_tpu.index.flat_adc import FlatADCIndex
from cvt_tpu.index.hnsw import HnswIndex
from cvt_tpu.index.ivf_adc import IVFADCIndex
from cvt_tpu.index.vocab_he import VocabHEIndex

__all__ = ["FlatIndex", "FlatSQIndex", "FlatADCIndex", "HnswIndex",
           "IVFADCIndex", "VocabHEIndex"]
