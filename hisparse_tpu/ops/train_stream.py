"""Stream-layout training: gradients computed IN the packed layout at
kernel rate — the scale-up form of :class:`~.autodiff.DiffSpmv`.

DiffSpmv keeps the trainable values as one CSR-order vector and re-emits
the packed streams every call.  That emission is an arbitrary relayout of
nnz elements, and XLA's TPU gather/scatter both measure ~0.15 Gelem/s on
v5e (scratch/probe_emit.py) — 250x the kernel time on the pruned-NN
training shapes, so the relayout, not the math, dominates a training step.

``StreamDiffSpmv`` removes the relayout entirely, the TPU-native way:

  * the TRAINABLE PARAMETERS are the two packed value streams themselves
    — ``vA`` (the A pack) and ``vT`` (the Aᵀ pack) — with pad slots held
    at 0 by a static mask;
  * the forward and ``dL/dx`` run the existing kernels on those streams
    directly (zero emission);
  * ``dL/dvA`` and ``dL/dvT`` come from `_gradstream_call`: per slot,
    ``g[row(slot)] * x_routed[slot]``.  The row-broadcast is the exact
    transpose of the kernel's POSITIONAL row accumulation (a VMEM slice,
    no gather); x-routing reuses the forward's `_route_x` pipeline — so
    each layout's gradient arrives already IN that layout at kernel rate;
  * elementwise optimizer updates keep the two copies consistent without
    ever mapping between layouts: slots of vA and vT holding the same CSR
    entry see the same (value, gradient) pair, and identical f32
    elementwise arithmetic yields identical results.  For steal-mantissa
    packs :meth:`replant` re-truncates the low 7 mantissa bits and
    re-plants each layout's own crossbar src field after the update (the
    format's standing 2^-17 truncation, applied identically to the
    mathematically-equal values, so consistency survives).

Reference lineage: the overlay the reference ships is inference-only
(sw/host.cpp:1-80 streams fixed weights); training through the packed
format at stream rate has no counterpart there.  plus_times fp32,
resident-variant packs only (the >VMEM paged regime keeps DiffSpmv's
vector path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix
from .autodiff import DiffSpmv, _run_op, _zero_ct
from .spmv import _gradstream_call


def _bcast_to_acc(vec_ext, perm, n_blocks, S, R):
    """Broadcast a renamed-space vector to the (n_blocks*S, 128)
    accumulator geometry: row (b, q*R + r, l) reads renamed slot
    (b, r, l) — the transpose of `_stripe_fold`'s (S//R, R) split."""
    ren = vec_ext[perm].reshape(n_blocks, R, 128)
    return jnp.broadcast_to(ren[:, None, :, :],
                            (n_blocks, S // R, R, 128)).reshape(-1, 128)


class StreamDiffSpmv:
    """``y = A @ x`` trainable in stream layout; see the module docstring.

    ``fn()`` returns ``(f, aux)`` with ``f(vA, vT, x, aux) -> y``
    jittable and differentiable; ``vA0``/``vT0`` are the initial
    parameter streams (flattened to the operator stream shapes).  Keep
    updates elementwise and call :meth:`replant` after each step (a
    no-op wrapper for non-steal packs).
    """

    def __init__(self, m: CSRMatrix, config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None,
                 interpret: bool = False, split_max="auto",
                 col_order=None, col_orderT=None):
        d = DiffSpmv(m, config, configT, interpret=interpret,
                     split_max=split_max, col_order=col_order,
                     col_orderT=col_orderT)
        for op, tag in ((d.op, "A"), (d.opT, "T")):
            if op.variant != "resident":
                raise ValueError(
                    f"StreamDiffSpmv needs resident packs; the {tag} pack "
                    "resolved to the paged variant — use DiffSpmv")
        self.d = d
        self.m = d.m
        self.num_rows, self.num_cols = d.num_rows, d.num_cols

        def mask_of(op, lin):
            mk = np.zeros(int(np.prod(op.vals.shape)), np.float32)
            mk[np.asarray(lin)] = 1.0
            return jnp.asarray(mk.reshape(op.vals.shape))

        aux = dict(d.aux)
        aux["maskA"] = mask_of(d.op, d.aux["mapA"])
        aux["maskT"] = mask_of(d.opT, d.aux["mapT"])
        if d.op.cfg.steal_mantissa:
            aux["splantA"] = jnp.asarray(
                np.asarray(d.aux["srcA"]).reshape(d.op.vals.shape))
        if d.opT.cfg.steal_mantissa:
            aux["splantT"] = jnp.asarray(
                np.asarray(d.aux["srcT"]).reshape(d.opT.vals.shape))
        self.aux = aux
        # parameters START as the packed streams (steal bits included)
        self.vA0 = d.op.vals
        self.vT0 = d.opT.vals
        self._apply = self._build()

    # -- value plumbing (host-side, for init/readback/tests) -----------
    def values(self, vA) -> np.ndarray:
        """CSR-order values read back from an A-layout stream."""
        flat = np.asarray(vA).reshape(-1)
        v = flat[np.asarray(self.aux["mapA"])]
        if self.d.op.cfg.steal_mantissa:
            v = (v.view(np.uint32) & np.uint32(0xFFFFFF80)).view(np.float32)
        return v

    def values_T(self, vT) -> np.ndarray:
        flat = np.asarray(vT).reshape(-1)
        v = flat[np.asarray(self.aux["mapT"])]
        if self.d.opT.cfg.steal_mantissa:
            v = (v.view(np.uint32) & np.uint32(0xFFFFFF80)).view(np.float32)
        return v

    def grads_csr(self, gA) -> np.ndarray:
        """CSR-order dL/dvals read back from an A-layout gradient."""
        return np.asarray(gA).reshape(-1)[np.asarray(self.aux["mapA"])]

    # -- the differentiable step ---------------------------------------
    def _build(self):
        d = self.d
        opA, opT = d.op, d.opT
        cfgA, cfgT = opA.cfg, opT.cfg
        n_rows, n_cols = self.num_rows, self.num_cols
        SA, RA = cfgA.sublanes, cfgA.stripes
        ST, RT = cfgT.sublanes, cfgT.stripes
        nbA, npA = opA.wp.n_blocks, opA.wp.n_parts
        nbT, npT = opT.wp.n_blocks, opT.wp.n_parts

        # Pad-slot invariant: the kernels consume vA/vT UNMASKED (a mask
        # multiply would cost 12 B/slot against the kernel's 8).  Pad
        # slots start at the identity in vA0/vT0, gradients are masked in
        # the gradstream kernel, and replant() only touches sub-2^-126
        # denormal bits the steal clean discards — so elementwise updates
        # of returned gradients keep pads at the identity by construction.
        def _forward(vA, x, aux):
            xp = x[aux["colpA"]] if "colpA" in aux else x
            y_ren = _run_op(opA, vA, xp, aux["idxTA"],
                            aux["partA"], aux["blockA"], aux["firstA"],
                            aux.get("cmapA")).reshape(-1)
            y = jnp.zeros(n_rows + 1, y_ren.dtype)
            return y.at[aux["permA"]].add(y_ren)[:n_rows]

        @jax.custom_vjp
        def apply(vA, vT, x, aux):
            return _forward(vA, x, aux)

        def fwd(vA, vT, x, aux):
            return _forward(vA, x, aux), (vA, vT, x, aux)

        def bwd(res, g):
            vA, vT, x, aux = res
            # dL/dx = A^T g through the transpose pack (kernel rate)
            gp = g[aux["colpT"]] if "colpT" in aux else g
            xb_ren = _run_op(opT, vT, gp, aux["idxTT"],
                             aux["partT"], aux["blockT"], aux["firstT"],
                             aux.get("cmapT")).reshape(-1)
            x_bar = jnp.zeros(n_cols + 1, xb_ren.dtype)
            x_bar = x_bar.at[aux["permT"]].add(xb_ren)[:n_cols]
            # in-layout gradient streams (kernel rate, no relayout)
            g_ext = jnp.concatenate([g, jnp.zeros(1, g.dtype)])
            gbA = _bcast_to_acc(g_ext, aux["permA"], nbA, SA, RA)
            xp = x[aux["colpA"]] if "colpA" in aux else x
            gA = _gradstream_call(
                vA, aux["idxTA"], aux["maskA"], aux["partA"],
                aux["blockA"], gbA, xp,
                aux.get("cmapA"), cfg=cfgA, n_blocks=nbA, n_parts=npA,
                interpret=opA.interpret, tiles_per_step=opA.tb)
            x_ext = jnp.concatenate(
                [x.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
            gbT = _bcast_to_acc(x_ext, aux["permT"], nbT, ST, RT)
            gT = _gradstream_call(
                vT, aux["idxTT"], aux["maskT"], aux["partT"],
                aux["blockT"], gbT, gp,
                aux.get("cmapT"), cfg=cfgT, n_blocks=nbT, n_parts=npT,
                interpret=opT.interpret, tiles_per_step=opT.tb)
            return (gA, gT, x_bar.astype(x.dtype),
                    {k: _zero_ct(p) for k, p in aux.items()})

        apply.defvjp(fwd, bwd)
        return apply

    def fn(self):
        """(f, aux): ``f(vA, vT, x, aux) -> y`` jittable/differentiable.

        ``(vA, vT)`` are TWO VIEWS OF ONE PARAMETER: the vjp returns each
        view's own copy of dL/dvals (the literal partial wrt vT of the
        composite would be zero — the forward reads only vA).  Apply the
        same elementwise update to both (``sgd_step``) and the views stay
        bit-consistent; updating only one diverges them."""
        return self._apply, self.aux

    def replant(self, vA, vT):
        """Re-truncate + re-plant steal-mantissa src bits after an
        elementwise update (identity for non-steal packs).  Both layouts
        truncate the same mathematical value identically, so the clean
        value planes stay bit-consistent."""
        aux = self.aux
        if "splantA" in aux:
            bits = jax.lax.bitcast_convert_type(vA, jnp.int32)
            vA = jax.lax.bitcast_convert_type(
                (bits & jnp.int32(-128)) | aux["splantA"], jnp.float32)
        if "splantT" in aux:
            bits = jax.lax.bitcast_convert_type(vT, jnp.int32)
            vT = jax.lax.bitcast_convert_type(
                (bits & jnp.int32(-128)) | aux["splantT"], jnp.float32)
        return vA, vT

    def clean(self, vA, vT):
        """Strip each layout's planted src bits so update arithmetic sees
        the CLEAN value plane (identical across layouts).  Updating the
        raw stored values instead would fold the per-layout src bits into
        the arithmetic and let the two copies drift ~2^-16."""
        aux = self.aux
        if "splantA" in aux:
            vA = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(vA, jnp.int32)
                & jnp.int32(-128), jnp.float32)
        if "splantT" in aux:
            vT = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(vT, jnp.int32)
                & jnp.int32(-128), jnp.float32)
        return vA, vT

    def sgd_step(self, vA, vT, gA, gT, lr):
        """One elementwise SGD step on both layouts (jit-friendly):
        clean -> update -> re-truncate + replant."""
        vA, vT = self.clean(vA, vT)
        return self.replant(vA - lr * gA, vT - lr * gT)

    def __call__(self, x, vA=None) -> jax.Array:
        v = self.vA0 if vA is None else vA
        return self._apply(v, self.vT0,
                           jnp.asarray(np.asarray(x, np.float32)),
                           self.aux)
