"""int8 scalar quantizer with cvt/faiss-compatible semantics.

Reference: scalar_quantization/ — faiss `IndexScalarQuantizer(d, QT_8bit,
METRIC_L2)` training (train/src/sq_train.cpp:100-103) and the hand-rolled
codec in scalar_quantization/int8_quan.cc:
  train : per-dim vmin_i = min_n x[n,i], vdiff_i = max_n x[n,i] - vmin_i
          (faiss QT_8bit "minmax" range stat) on L2-normalized inputs.
  encode: code_i = int(255 * clip((x_i - vmin_i)/vdiff_i, 0, 1))
          — note TRUNCATION, matching Int8Encode (int8_quan.cc:72-94);
          rounding='round' gives faiss compute_codes semantics.
  decode: x_i = vmin_i + vdiff_i * (code_i + 0.5) / 255
          (int8_quan.cc:117-132, the +0.5 dequant offset).

All three are elementwise jitted ops over [N, D] batches. The asymmetric
int8 distance scan that consumes these codes lives in
cvt_tpu.index.flat_sq / cvt_tpu.ops.pallas.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.ops.linalg import l2_normalize


@partial(jax.jit, static_argnames=("rounding",))
def _encode(x, vmin, vdiff, rounding: str):
    xi = jnp.where(vdiff != 0, (x - vmin) / jnp.where(vdiff == 0, 1, vdiff),
                   0.0)
    xi = jnp.clip(xi, 0.0, 1.0)
    if rounding == "truncate":       # cvt Int8Encode: bytes[i] = (int)(255*xi)
        code = jnp.floor(255.0 * xi)
    elif rounding == "round":        # faiss compute_codes: int(255*x + 0.5)
        code = jnp.floor(255.0 * xi + 0.5)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    return jnp.clip(code, 0, 255).astype(jnp.uint8)


@jax.jit
def _decode(codes, vmin, vdiff):
    return vmin + vdiff * (codes.astype(jnp.float32) + 0.5) / 255.0


@dataclass
class ScalarQuantizer:
    """Per-dimension 8-bit scalar quantizer (QT_8bit minmax)."""

    vmin: jax.Array        # [D]
    vdiff: jax.Array       # [D]
    rounding: str = "truncate"

    @property
    def dim(self) -> int:
        return self.vmin.shape[0]

    @classmethod
    def train(cls, x, *, l2norm: bool = True,
              rounding: str = "truncate") -> "ScalarQuantizer":
        """Train per-dim (vmin, vdiff) on x [N, D].

        l2norm=True matches the reference trainer, which L2-normalizes every
        vector before faiss training (sq_train.cpp:92-99).
        """
        x = jnp.asarray(x, jnp.float32)
        if l2norm:
            x = l2_normalize(x)
        vmin = jnp.min(x, axis=0)
        vmax = jnp.max(x, axis=0)
        return cls(vmin=vmin, vdiff=vmax - vmin, rounding=rounding)

    def encode(self, x, *, l2norm: bool = False) -> jax.Array:
        """x [..., D] float -> uint8 codes [..., D]."""
        x = jnp.asarray(x, jnp.float32)
        if l2norm:
            x = l2_normalize(x)
        return _encode(x, self.vmin, self.vdiff, self.rounding)

    def decode(self, codes) -> jax.Array:
        """uint8 codes [..., D] -> float32 [..., D]."""
        return _decode(jnp.asarray(codes), self.vmin, self.vdiff)

    # Affine decode form used by the asymmetric distance scan:
    # decode(c) = bias + scale * c, elementwise per dim.
    @property
    def scale(self) -> jax.Array:    # [D]
        return self.vdiff / 255.0

    @property
    def bias(self) -> jax.Array:     # [D]
        return self.vmin + 0.5 * self.vdiff / 255.0

    def reconstruction_loss(self, x, *, l2norm: bool = True):
        """Mean L2 loss and mean IP of decode(encode(x)) vs x — the
        self-check the reference trainer prints (sq_train.cpp:134-153)."""
        x = jnp.asarray(x, jnp.float32)
        if l2norm:
            x = l2_normalize(x)
        rec = self.decode(self.encode(x))
        l2 = jnp.mean(jnp.sqrt(jnp.sum(jnp.square(x - rec), axis=-1)))
        ip = jnp.mean(jnp.sum(x * rec, axis=-1))
        return l2, ip

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        np.savez(path, vmin=np.asarray(self.vmin),
                 vdiff=np.asarray(self.vdiff), rounding=self.rounding)

    @classmethod
    def load(cls, path: str) -> "ScalarQuantizer":
        z = np.load(path, allow_pickle=False)
        return cls(vmin=jnp.asarray(z["vmin"]),
                   vdiff=jnp.asarray(z["vdiff"]),
                   rounding=str(z["rounding"]))
