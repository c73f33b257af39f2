"""Pallas TPU kernel for the boolean lockstep NFA (contains/match).

The XLA formulation (device.DeviceProgram.nfa_matches) runs one HLO loop
step per char with state round-tripping through HBM.  This kernel keeps the
whole automaton in VMEM for a row tile and drives every transition through
the MXU:

    closed = state @ closure[u]          (eps-closure reachability)
    pred   = char-compare + precomputed class membership
    state' = (closed * pred) @ next_mat  (consume edges)

Char-class membership, word-char flags, and the per-position closure-
variant id are precomputed OUTSIDE the kernel (tiny gathers XLA already
does well), so the kernel body is pure matmul/elementwise — no dynamic
gathers in Mosaic; dynamic positions use pl.ds ref slices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import use_interpret_mode
from .compiler import ANY, ANYNL, CCLASS, CHAR, NCCLASS

ROW_TILE = 256
INST_PAD = 128  # pad the instruction dim to the full lane width: small
# (non-128-multiple) minor dims crash Mosaic layout inference, and padded
# matmuls tile cleanly onto the MXU anyway


def _kernel_factory(U, I, anchored):
    PI = INST_PAD

    def kernel(
        chars_ref,  # [T, L] int32
        lens2_ref,  # [G, T] int32 (full; row = program_id)
        memb_ref,  # [T, L] uint32: per-position class-pred bitmask (bit i
        #            = inst i matches); Mosaic can only roll 32-bit data
        uid_ref,  # [T, L+1] int32: closure-variant id per position
        closure_ref,  # [U*PI, PI] f32 (rank-3 flattened; static row slices)
        next_ref,  # [PI, PI] f32
        isend_ref,  # [1, PI] f32
        start_ref,  # [1, PI] f32
        types_ref,  # [1, PI] int32 (padded lanes hold -1 = no type)
        args_ref,  # [1, PI] int32
        out_ref,  # [G, T] int32
    ):
        from jax.experimental import pallas as pl

        gi = pl.program_id(0)
        T, L = chars_ref.shape
        lens_v = lens2_ref[pl.ds(gi, 1), :][0, :]
        types = types_ref[:]  # [1, PI]
        args = args_ref[:]
        is_char = (types == CHAR).astype(jnp.float32)
        is_any = (types == ANY).astype(jnp.float32)
        is_anynl = (types == ANYNL).astype(jnp.float32)
        is_cc = ((types == CCLASS) | (types == NCCLASS)).astype(jnp.float32)

        from jax.experimental.pallas import tpu as pltpu

        def step(p, carry):
            # rotating buffers: read static column 0, then roll axis 1
            state, matched, chars_v, memb_v, uid_v = carry
            cur = jnp.where(p < lens_v, chars_v[:, 0], 0)  # [T]
            if anchored:
                inject = ((p == 0) & (matched < 0.5)).astype(jnp.float32)
            else:
                inject = (matched < 0.5).astype(jnp.float32)
            state = jnp.maximum(state, start_ref[:] * inject[:, None])
            uid = uid_v[:, 0]  # [T]
            if U == 1:
                closed = jnp.dot(
                    state,
                    closure_ref[0:PI, :],
                    preferred_element_type=jnp.float32,
                )
            else:
                closed = jnp.zeros_like(state)
                for u in range(U):
                    cu = jnp.dot(
                        state,
                        closure_ref[u * PI : (u + 1) * PI, :],
                        preferred_element_type=jnp.float32,
                    )
                    closed = jnp.where((uid == u)[:, None], cu, closed)
            closed = jnp.minimum(closed, 1.0)
            matched = jnp.maximum(
                matched,
                jnp.max(closed * isend_ref[:], axis=1),
            )
            # char predicate [T, PI]; unpack the membership bitmask word
            # (bits beyond I are zero by construction: shift is clamped and
            # the padded type lanes are -1 so no predicate term fires)
            curE = cur[:, None]
            bit_i = jax.lax.broadcasted_iota(jnp.int32, (1, PI), 1)
            shift = jnp.minimum(bit_i, 31).astype(jnp.uint32)
            memb_p = (
                (memb_v[:, 0][:, None] >> shift) & jnp.uint32(1)
            ).astype(jnp.int32)  # Mosaic has no uint32->f32 cast
            memb_p = jnp.where(bit_i < I, memb_p, 0)
            pred = (
                is_char * (curE == args)
                + is_any * ((curE != 10) & (curE != 0))
                + is_anynl * (curE != 0)
                + is_cc * memb_p.astype(jnp.float32)
            )
            pred = pred * (curE != 0)
            fire = closed * pred
            state = jnp.minimum(
                jnp.dot(
                    fire, next_ref[:], preferred_element_type=jnp.float32
                ),
                1.0,
            )
            return (
                state,
                matched,
                pltpu.roll(chars_v, chars_v.shape[1] - 1, 1),
                pltpu.roll(memb_v, memb_v.shape[1] - 1, 1),
                pltpu.roll(uid_v, uid_v.shape[1] - 1, 1),
            )

        state0 = jnp.zeros((T, PI), jnp.float32)
        matched0 = jnp.zeros((T,), jnp.float32)
        init = (state0, matched0, chars_ref[:], memb_ref[:], uid_ref[:])
        _, matched, *_ = jax.lax.fori_loop(0, L + 1, step, init)
        out_ref[pl.ds(gi, 1), :] = (matched > 0.5).astype(jnp.int32)[None, :]

    return kernel


class PallasNFA:
    """Per-DeviceProgram Pallas matcher."""

    def __init__(self, dp):
        if dp.I > 32:
            raise ValueError(
                "PallasNFA bit-packs class membership into uint32 words: "
                "programs with >32 instructions use the XLA engine"
            )
        self.dp = dp
        prog = dp.prog
        self.I = dp.I
        cu = np.asarray(jax.device_get(dp.closure_unique)).astype(np.float32)
        self.closure = jnp.asarray(cu)
        self.U = cu.shape[0]
        self.ctx_map = dp.ctx_map.astype(jnp.int32)
        self.next_mat = dp.next_mat.astype(jnp.float32)
        self.is_end = dp.is_end.astype(jnp.float32)
        self.start_vec = dp.start_vec.astype(jnp.float32)
        self.types = jnp.asarray(prog.types)
        self.args = jnp.asarray(prog.args)
        # per-inst class id (or 0) for membership precompute
        cls_of_inst = np.where(
            np.isin(prog.types, (CCLASS, NCCLASS)), prog.args, 0
        )
        self.cls_of_inst = jnp.asarray(cls_of_inst, jnp.int32)
        self.is_ncc = jnp.asarray(prog.types == NCCLASS)

    @partial(jax.jit, static_argnums=(0, 3))
    def matches(self, chars, lengths, anchored: bool):
        from jax.experimental import pallas as pl

        N, L = chars.shape
        if N == 0:
            return jnp.zeros((0,), jnp.bool_)
        T = ROW_TILE
        pad = (-N) % T
        if pad:
            chars = jnp.pad(chars, ((0, pad), (0, 0)))
            lengths = jnp.pad(lengths, (0, pad))
        NP = N + pad
        # precompute per-position per-inst class predicate, bit-packed to a
        # uint32 word per position (I <= 32; Mosaic only rolls 32-bit data)
        in_class = self.dp._class_membership(chars)  # [NP, L, n_classes]
        memb = in_class[..., self.cls_of_inst]  # [NP, L, I]
        memb = jnp.where(self.is_ncc[None, None, :], ~memb, memb)
        bit = jnp.arange(self.I, dtype=jnp.uint32)[None, None, :]
        membw = jnp.sum(memb.astype(jnp.uint32) << bit, axis=-1)
        # precompute the closure-variant id per (row, position incl. the
        # EOS sentinel position L)
        from ..unicode.tables import FLAG_ALPHANUM, device_tables

        flags, _ = device_tables()
        safe = jnp.clip(chars, 0, flags.shape[0] - 1)
        alnum = (
            (chars > 0)
            & (chars < flags.shape[0])
            & ((flags[safe].astype(jnp.int32) & FLAG_ALPHANUM) > 0)
        ).astype(jnp.int32)
        pos = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        lensE = lengths[:, None]
        curc = jnp.pad(chars, ((0, 0), (0, 1)))
        curc = jnp.where(pos < lensE, curc, 0)
        prevc = jnp.pad(chars, ((0, 0), (1, 0)))[:, : L + 1]
        prevc = jnp.where((pos > 0) & (pos - 1 < lensE), prevc, 0)
        al_cur = jnp.pad(alnum, ((0, 0), (0, 1)))
        al_cur = jnp.where(pos < lensE, al_cur, 0)
        al_prev = jnp.pad(alnum, ((0, 0), (1, 0)))[:, : L + 1]
        al_prev = jnp.where((pos > 0) & (pos - 1 < lensE), al_prev, 0)
        ctx = (
            (pos == 0).astype(jnp.int32) * 1
            + (prevc == 10).astype(jnp.int32) * 2
            + (curc == 0).astype(jnp.int32) * 4
            + (curc == 10).astype(jnp.int32) * 8
            + (al_cur != al_prev).astype(jnp.int32) * 16
        )
        uid = self.ctx_map[ctx].astype(jnp.int32)  # [NP, L+1]

        kernel = _kernel_factory(self.U, self.I, anchored)
        PI = INST_PAD
        padI = PI - self.I
        closure2 = jnp.pad(
            self.closure, ((0, 0), (0, padI), (0, padI))
        ).reshape(self.U * PI, PI)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NP // T, T), jnp.int32),
            grid=(NP // T,),
            in_specs=[
                pl.BlockSpec((T, L), lambda i: (i, 0)),
                pl.BlockSpec((NP // T, T), lambda i: (0, 0)),
                pl.BlockSpec((T, L), lambda i: (i, 0)),
                pl.BlockSpec((T, L + 1), lambda i: (i, 0)),
                pl.BlockSpec((self.U * PI, PI), lambda i: (0, 0)),
                pl.BlockSpec((PI, PI), lambda i: (0, 0)),
                pl.BlockSpec((1, PI), lambda i: (0, 0)),
                pl.BlockSpec((1, PI), lambda i: (0, 0)),
                pl.BlockSpec((1, PI), lambda i: (0, 0)),
                pl.BlockSpec((1, PI), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((NP // T, T), lambda i: (0, 0)),
            interpret=use_interpret_mode(),
        )(
            chars.astype(jnp.int32),
            lengths.astype(jnp.int32).reshape(NP // T, T),
            membw,
            uid,
            closure2,
            jnp.pad(self.next_mat, ((0, padI), (0, padI))),
            jnp.pad(self.is_end, (0, padI))[None, :],
            jnp.pad(self.start_vec, (0, padI))[None, :],
            jnp.pad(self.types, (0, padI), constant_values=-1)[None, :],
            jnp.pad(self.args, (0, padI), constant_values=-1)[None, :],
        )
        return out.reshape(NP)[:N] > 0
