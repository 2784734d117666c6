"""Full-video inpainting algorithms (TPU re-design of reference
model_chn.py:87-254).

The reference runs three Python loops that call the network once per
(frame, reference) pair with batch 1, deciding loop exits from host-side
hole percentages. This module compiles each algorithm into a SINGLE device
program: the candidate schedules (which reference frame each target
consumes in each round) are static given ``(F, s, D, N)``, so they are
precomputed host-side as index tables and the control flow runs on-device
with ``lax.scan`` / ``lax.while_loop`` over them — zero host round-trips
per round (each round-trip through this machine's TPU relay costs ~33 ms,
more than a whole batched refine).

- ``inpaint_ff`` (frame-by-frame, reference :87-135): independent per
  frame. Each frame owns a pointer into its compacted candidate list
  (distance-sorted, smaller index first — ``get_indexes_ff``); every
  iteration gathers up to ``compact`` still-active frames into a compact
  batch, refines each against its own next candidate, and scatters back.
  Frames stop once their hole < ``e``% or their candidates exhaust; the
  loop ends when no frame is eligible.
- ``inpaint_ip`` (inpaint-and-propagate, reference :137-191): sequential by
  design (center-out, previously inpainted frames feed later ones) —
  ``lax.scan`` over frames in reference order, ``lax.while_loop`` over each
  frame's candidate list inside.
- ``inpaint_cp`` (copy-and-propagate, reference :193-254): N passes over
  alternating frame parities; within a pass, active frames only read
  neighbors outside the updated set, so each (pass, ±s) half-step is one
  batched refine over the active frames (``lax.cond``-skipped when the
  active set is empty, as the reference's ``continue``). The possible
  target set per (parity, ±s) half-step is static — frames of that parity
  class with an in-range neighbor — so each half-step gathers exactly
  that compact set (width C ≈ fp/2) instead of refining the whole padded
  bucket and masking: the same active-frame compaction ff uses.

Numerical semantics per refine step are the reference's exactly: shrink the
mask by the visibility map, refill with the composite + gray fill, stop at
hole < e% (model_chn.py:121-131). The pre-compilation host-loop twins
(``*_host``) remain as the readable reference implementations; equivalence
is asserted in tests/test_infer.py.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FILL_COLOR = (0.485, 0.456, 0.406)


def get_indexes_ff(t: int, max_t: int, s: int = 1, D: int = 20) -> List[int]:
    """Reference-frame candidate order for frame ``t``
    (reference model_chn.py:459-482)."""
    cands = [i for i in range(max_t) if i != t]
    cands = [r for _, r in sorted((abs(i - t), i) for i in cands)]
    return [i for i in cands if abs(i - t) <= D and abs(i - t) % s == 0]


def get_indexes_ip(t: int, t_list: List[int], s: int, D: int) -> List[int]:
    """Candidates for inpaint-and-propagate: already-inpainted frames first
    (reference model_chn.py:484-503)."""
    inpainted = list(reversed(t_list[: t_list.index(t)]))
    ff = get_indexes_ff(t, len(t_list), s, D)
    return inpainted + [i for i in ff if i not in inpainted]


def _bucket(n: int, step: int = 8) -> int:
    """Rounds the frame count up to a multiple of ``step``: device programs
    compile once per (bucket, H, W) instead of once per sequence length
    (DAVIS clips are 25-104 frames; remote compiles cost minutes each).
    Padded frames are hole-free and excluded from every candidate table,
    so they pass through the loops untouched."""
    return max(step, -(-n // step) * step)


def _pad_frames(x, m, fp: int):
    """Pads to ``fp`` frames: frames replicate the last real frame (never
    referenced — candidate indices are bounded by the real count), masks
    are zero (hole-free => inert under every algorithm's update rule).
    jnp ops so device-resident inputs stay on device (a host round-trip
    through the remote relay costs seconds at 512² sequences)."""
    f = x.shape[0]
    if fp == f:
        return x, m
    reps = jnp.repeat(x[-1:], fp - f, axis=0)
    return (
        jnp.concatenate([jnp.asarray(x), reps], axis=0),
        jnp.concatenate(
            [jnp.asarray(m), jnp.zeros((fp - f,) + m.shape[1:], m.dtype)], axis=0
        ),
    )


class Inpainter:
    """Drives the three algorithms over one decoded sequence.

    Args:
        chn_apply: ``(params, x_t, v_t, x_refs, v_refs, v_maps) ->
            (y_hat, y_hat_comp)``.
        chn_params: trained CHN params.
        align_fn: aligner closure over frozen params.
        device_loops: compile each algorithm's full loop on-device
            (default); ``False`` runs the host-loop twins.
    """

    def __init__(
        self,
        chn_apply: Callable,
        chn_params,
        align_fn: Callable,
        device_loops: bool = True,
    ):
        self.chn_apply = chn_apply
        self.chn_params = chn_params
        self.align_fn = align_fn
        self.device_loops = device_loops
        self._refine = jax.jit(self._refine_impl)
        self._progs: Dict[Tuple, Callable] = {}

    def _refine_impl(self, x_tgt, m_tgt, x_ref, m_ref, active):
        """One masked refinement round over a batch of target frames.

        x_tgt: (N, H, W, 3); m_tgt: (N, H, W, 1); x_ref/m_ref like targets;
        active: (N,) bool — frames to update this round.
        """
        fill = jnp.asarray(FILL_COLOR, dtype=x_tgt.dtype)
        xa, va, vm = self.align_fn(x_tgt, m_tgt, x_ref[:, None], m_ref[:, None])
        _, y_hat_comp = self.chn_apply(
            self.chn_params, x_tgt, 1 - m_tgt, xa, va, vm
        )
        comp = y_hat_comp[:, 0]
        new_m = m_tgt - vm[:, 0]
        new_x = (1 - new_m) * comp + new_m * fill
        act = active[:, None, None, None]
        x_out = jnp.where(act, new_x, x_tgt)
        m_out = jnp.where(act, new_m, m_tgt)
        comp_out = jnp.where(act, comp, x_tgt)  # callers overwrite via have_comp
        hole_pct = 100.0 * jnp.sum(m_out, axis=(1, 2, 3)) / (
            m_out.shape[1] * m_out.shape[2]
        )
        return x_out, m_out, comp_out, hole_pct

    def _program(self, key: Tuple, build: Callable) -> Callable:
        prog = self._progs.get(key)
        if prog is None:
            prog = self._progs[key] = build()
        return prog

    # ------------------------------------------------------------------ ff

    def inpaint_ff(
        self, x: np.ndarray, m: np.ndarray, s: int = 1, D: int = 20, e: float = 1.0,
        as_numpy: bool = True, compact: int = 0,
    ) -> np.ndarray:
        """Frame-by-frame, vectorized over frames (reference :87-135).

        x: (F, H, W, 3); m: (F, H, W, 1). Returns (F, H, W, 3).
        ``as_numpy=False`` returns the device array without the
        device->host fetch (callers that keep the result on device —
        benchmarking, chained processing).

        Each iteration gathers up to ``compact`` active frames into a
        compact batch, refines them against each frame's OWN next
        candidate (per-frame pointer into its compacted candidate list,
        exactly the reference's per-frame loop), and scatters back —
        instead of refining the whole padded bucket per global round.
        Late rounds usually have 1-2 stubborn frames active; at width 8
        the wasted forwards drop from ``fp - active`` to
        ``compact - active`` per step. Frames are independent in ff (refs
        are the raw sequence), so per-frame results are identical to the
        round-synchronized schedule. ``compact=0`` picks ``min(fp, 8)``.
        """
        if not self.device_loops:
            return self.inpaint_ff_host(x, m, s, D, e)
        F = x.shape[0]
        fp = _bucket(F)
        C = compact or min(fp, 8)
        cand_lists = [get_indexes_ff(t, F, s, D) for t in range(F)]
        # Table width bucketed so one compile serves every (F, s, D) whose
        # longest candidate list lands in the same bucket.
        width = _bucket(max(1, max(len(c) for c in cand_lists)))
        cand_tab = np.zeros((fp, width), np.int32)
        n_cands = np.zeros((fp,), np.int32)  # padded frames: never eligible
        for t, c in enumerate(cand_lists):
            cand_tab[t, : len(c)] = c
            n_cands[t] = len(c)
        xp, mp = _pad_frames(x, m, fp)
        prog = self._program(
            ("ff", (fp,) + x.shape[1:], width, C, e),
            lambda: self._ff_program(fp, width, C, e),
        )
        out = prog(
            jnp.asarray(xp), jnp.asarray(mp), jnp.asarray(cand_tab),
            jnp.asarray(n_cands),
        )
        return np.asarray(out[:F]) if as_numpy else out[:F]

    def _ff_program(self, F: int, width: int, C: int, e: float) -> Callable:
        """``run(x, m, cand_tab (F, width) i32, n_cands (F,) i32)``.

        Per-frame candidate pointers + active-frame compaction: the while
        loop gathers the first ``C`` eligible frames (unfinished AND
        candidates remain), refines that compact batch against each
        frame's own next candidate, scatters the results back, and bumps
        the pointers. The candidate tables are runtime inputs, so one
        compile per (padded-F, H, W, width-bucket, C) serves every real
        sequence length and (s, D) schedule in the bucket."""

        @jax.jit
        def run(x, m, cand_tab, n_cands):
            def eligible(have, hole, kptr):
                return (~have | (hole > e)) & (kptr < n_cands)

            def cond(st):
                x_tgt, m_tgt, y_out, have, hole, kptr = st
                return jnp.any(eligible(have, hole, kptr))

            def body(st):
                x_tgt, m_tgt, y_out, have, hole, kptr = st
                el = eligible(have, hole, kptr)
                # First C eligible frames; empty slots get index F and are
                # dropped at scatter time.
                (idx,) = jnp.nonzero(el, size=C, fill_value=F)
                slot_ok = idx < F
                safe = jnp.minimum(idx, F - 1)
                r = cand_tab[safe, jnp.minimum(kptr[safe], width - 1)]
                # ff aligns against the *original* frames, not inpainted
                # ones (reference :115-119 samples x, m — the raw
                # sequence).
                xb, mb, comp, hole_b = self._refine_impl(
                    x_tgt[safe], m_tgt[safe], x[r], m[r], slot_ok
                )
                x_tgt = x_tgt.at[idx].set(xb, mode="drop")
                m_tgt = m_tgt.at[idx].set(mb, mode="drop")
                y_out = y_out.at[idx].set(comp, mode="drop")
                hole = hole.at[idx].set(hole_b, mode="drop")
                have = have.at[idx].set(True, mode="drop")
                kptr = kptr.at[idx].add(1, mode="drop")
                return (x_tgt, m_tgt, y_out, have, hole, kptr)

            init = (
                x, m, x,
                jnp.zeros((F,), bool), jnp.full((F,), jnp.inf, jnp.float32),
                jnp.zeros((F,), jnp.int32),
            )
            return jax.lax.while_loop(cond, body, init)[2]

        return run

    def inpaint_ff_host(
        self, x: np.ndarray, m: np.ndarray, s: int = 1, D: int = 20, e: float = 1.0,
        compact: int = 0,
    ) -> np.ndarray:
        """Host-loop twin of ``inpaint_ff`` (one refine call per round).

        ``compact`` is accepted for signature parity with :meth:`inpaint_ff`
        and ignored: compaction only re-times the per-frame schedule, and ff
        frames are independent (refs are the raw sequence), so per-frame
        results are identical for every compact width."""
        F = x.shape[0]
        x_dev = jnp.asarray(x)
        m_dev = jnp.asarray(m)
        x_tgt, m_tgt, y_out = x_dev, m_dev, x_dev
        have_comp = np.zeros(F, bool)
        hole = np.full(F, np.inf, np.float32)

        offsets: List[int] = []
        for d in range(s, D + 1, s):
            offsets += [-d, d]

        idx = np.arange(F)
        valid_all = np.stack([(idx + o >= 0) & (idx + o < F) for o in offsets])
        valid_ahead = np.flip(np.logical_or.accumulate(np.flip(valid_all, 0), 0), 0)
        for k, off in enumerate(offsets):
            ref_idx = idx + off
            unfinished = ~have_comp | (hole > e)
            # End only when no unfinished frame has a candidate in ANY
            # remaining round (each frame's candidate list is independent,
            # reference model_chn.py:460-482); skip an empty round.
            if not (valid_ahead[k] & unfinished).any():
                break
            active = valid_all[k] & unfinished
            if not active.any():
                continue
            ref_idx_c = jnp.asarray(np.clip(ref_idx, 0, F - 1))
            x_tgt, m_tgt, comp, hole_dev = self._refine(
                x_tgt, m_tgt, x_dev[ref_idx_c], m_dev[ref_idx_c], jnp.asarray(active)
            )
            y_out = jnp.where(jnp.asarray(active)[:, None, None, None], comp, y_out)
            have_comp |= active
            hole = np.asarray(hole_dev)
        return np.asarray(y_out)

    # ------------------------------------------------------------------ ip

    def inpaint_ip(
        self, x: np.ndarray, m: np.ndarray, s: int = 1, D: int = 20, e: float = 1.0,
        as_numpy: bool = True,
    ) -> np.ndarray:
        """Inpaint-and-propagate (reference :137-191): center-out order,
        previously inpainted frames serve as references. The inter-frame
        data dependency is real (each frame's first candidate is the
        previously inpainted frame), so frames run sequentially — as one
        ``lax.scan`` over the precomputed frame order with the candidate
        while-loop on-device."""
        if not self.device_loops:
            return self.inpaint_ip_host(x, m, s, D, e)
        F = x.shape[0]
        fp = _bucket(F)
        t_list = sorted(range(F), key=lambda i: abs(i - F // 2))
        cand_lists = [get_indexes_ip(t, t_list, s, D) for t in t_list]
        # Candidates are unique frame indices != t, so width <= fp - 1 —
        # the static table width shared by the whole bucket.
        width = fp - 1
        cand_tab = np.zeros((fp, width), np.int32)
        n_cands = np.ones((fp,), np.int32)  # padded frames: 1 inert refine
        for i, c in enumerate(cand_lists):
            cand_tab[i, : len(c)] = c
            n_cands[i] = len(c)
        t_arr = np.asarray(t_list + list(range(F, fp)), np.int32)
        xp, mp = _pad_frames(x, m, fp)
        prog = self._program(
            ("ip", (fp,) + x.shape[1:], e), lambda: self._ip_program(fp, e)
        )
        out = prog(
            jnp.asarray(xp), jnp.asarray(mp), jnp.asarray(t_arr),
            jnp.asarray(cand_tab), jnp.asarray(n_cands),
        )
        return np.asarray(out[:F]) if as_numpy else out[:F]

    def _ip_program(self, F: int, e: float) -> Callable:
        """``run(x, m, t_arr (F,), cand_tab (F, F-1), n_cands (F,))`` —
        frame order and candidate tables are runtime inputs (one compile
        per bucket)."""
        width = F - 1

        @jax.jit
        def run(x, m, t_arr, cand_tab, n_cands):
            def frame_step(carry, inp):
                y_inp, m_inp = carry
                t, cand_row, n = inp
                x_t = jax.lax.dynamic_index_in_dim(y_inp, t, 0)  # (1, H, W, 3)
                m_t = jax.lax.dynamic_index_in_dim(m_inp, t, 0)

                def cond(st):
                    k, _, _, _, hole = st
                    return (k == 0) | ((k < n) & (hole > e))

                def body(st):
                    k, x_t, m_t, _, _ = st
                    r = cand_row[jnp.minimum(k, width - 1)]
                    x_t, m_t, comp, hole = self._refine_impl(
                        x_t, m_t,
                        jax.lax.dynamic_index_in_dim(y_inp, r, 0),
                        jax.lax.dynamic_index_in_dim(m_inp, r, 0),
                        jnp.ones((1,), bool),
                    )
                    return (k + 1, x_t, m_t, comp, hole[0])

                init = (jnp.asarray(0), x_t, m_t, x_t,
                        jnp.asarray(jnp.inf, jnp.float32))
                _, _, _, comp, _ = jax.lax.while_loop(cond, body, init)
                y_inp = jax.lax.dynamic_update_index_in_dim(y_inp, comp[0], t, 0)
                m_inp = jax.lax.dynamic_update_index_in_dim(
                    m_inp, jnp.zeros_like(m_t[0]), t, 0
                )
                return (y_inp, m_inp), None

            (y_inp, _), _ = jax.lax.scan(
                frame_step, (x, m), (t_arr, cand_tab, n_cands)
            )
            return y_inp

        return run

    def inpaint_ip_host(
        self, x: np.ndarray, m: np.ndarray, s: int = 1, D: int = 20, e: float = 1.0
    ) -> np.ndarray:
        """Host-loop twin of ``inpaint_ip`` (one refine call per candidate)."""
        F = x.shape[0]
        y_inp = np.array(x, copy=True)
        m_inp = np.array(m, copy=True)
        t_list = sorted(range(F), key=lambda i: abs(i - F // 2))
        one = jnp.ones((1,), bool)

        for t in t_list:
            cands = get_indexes_ip(t, t_list, s, D)
            comp = None
            hole = np.inf
            while (cands and hole > e) or comp is None:
                r = cands.pop(0)
                x_t, m_t, comp_d, hole_d = self._refine(
                    jnp.asarray(y_inp[t : t + 1]),
                    jnp.asarray(m_inp[t : t + 1]),
                    jnp.asarray(y_inp[r : r + 1]),
                    jnp.asarray(m_inp[r : r + 1]),
                    one,
                )
                y_inp[t] = np.asarray(x_t)[0]
                m_inp[t] = np.asarray(m_t)[0]
                comp = np.asarray(comp_d)[0]
                hole = float(np.asarray(hole_d)[0])
            m_inp[t] = 0
            y_inp[t] = comp
        return y_inp

    # ------------------------------------------------------------------ cp

    def inpaint_cp(
        self, x: np.ndarray, m: np.ndarray, N: int = 20, s: int = 1, e: float = 1.0,
        as_numpy: bool = True,
    ) -> np.ndarray:
        """Copy-and-propagate (reference :193-254): N alternating-parity
        passes, each half-step one batched refine over the COMPACT static
        target set of that (parity, ±s) half-step — frames of the pass's
        parity class whose ±s neighbor is in range (width C ≈ fp/2, vs the
        whole padded bucket before r5; at F=12/fp=16 that's 6 refines per
        half-step instead of 16). Per-frame membership of the runtime
        active set (``holes > 0``) is evaluated on the gathered batch, so
        results are identical to the full-bucket schedule."""
        if not self.device_loops:
            return self.inpaint_cp_host(x, m, N, s, e)
        F = x.shape[0]
        fp = _bucket(F)
        modulus = s if s > 1 else 2
        lists = [
            [
                t
                for t in range(F)
                if (t // s) % modulus == p and 0 <= t + d < F
            ]
            for p in (0, 1)
            for d in (-s, s)
        ]
        # Compact width bucketed to a multiple of 2 so nearby sequence
        # lengths in the same frame bucket share one compile.
        C = max(2, -(-max(len(tl) for tl in lists) // 2) * 2)
        tgt_tab = np.full((2, 2, C), fp, np.int32)  # fp: dropped at scatter
        ref_tab = np.zeros((2, 2, C), np.int32)
        for p in (0, 1):
            for d_i, d in enumerate((-s, s)):
                tl = lists[p * 2 + d_i]
                tgt_tab[p, d_i, : len(tl)] = tl
                ref_tab[p, d_i, : len(tl)] = [t + d for t in tl]
        xp, mp = _pad_frames(x, m, fp)
        prog = self._program(
            ("cp", (fp,) + x.shape[1:], N, e, C),
            lambda: self._cp_program(fp, N, e),
        )
        out = prog(
            jnp.asarray(xp), jnp.asarray(mp), jnp.asarray(tgt_tab),
            jnp.asarray(ref_tab),
        )
        return np.asarray(out[:F]) if as_numpy else out[:F]

    def _cp_program(self, F: int, N: int, e: float) -> Callable:
        """``run(x, m, tgt_tab (2,2,C) i32, ref_tab (2,2,C) i32)`` — the
        compact (parity, direction) target/neighbor tables are runtime
        inputs (one compile per (bucket, C)). Slots padded with ``F`` are
        inert: their gather reads a clamped frame with ``active=False``
        (refine passes it through) and their scatter is dropped."""

        @jax.jit
        def run(x, m, tgt_tab, ref_tab):
            def cond(st):
                i, _, m_inp = st
                holes = jnp.sum(m_inp, axis=(1, 2, 3))
                return (i < N) & ((i <= 1) | jnp.any(holes > 0))

            def body(st):
                i, y_inp, m_inp = st
                p = jnp.remainder(i, 2)
                for d_i in range(2):
                    tgt = tgt_tab[p, d_i]  # (C,)
                    ok = tgt < F
                    safe = jnp.minimum(tgt, F - 1)
                    ref = ref_tab[p, d_i]
                    holes = jnp.sum(m_inp[safe], axis=(1, 2, 3))
                    active = ok & (holes > 0)

                    def half_step(args, tgt=tgt, safe=safe, ref=ref,
                                  active=active, i=i):
                        y_inp, m_inp = args
                        x_t, m_t, comp, hole_pct = self._refine_impl(
                            y_inp[safe], m_inp[safe],
                            y_inp[ref], m_inp[ref], active,
                        )
                        # Frames done (hole < e) or in the final two passes
                        # are finalized: mask zeroed, output = composite
                        # (reference :250-252).
                        finalize = active & ((hole_pct < e) | (i >= N - 2))
                        fin = finalize[:, None, None, None]
                        xb = jnp.where(fin, comp, x_t)
                        mb = jnp.where(fin, 0.0, m_t)
                        return (
                            y_inp.at[tgt].set(xb, mode="drop"),
                            m_inp.at[tgt].set(mb, mode="drop"),
                        )

                    y_inp, m_inp = jax.lax.cond(
                        jnp.any(active), half_step, lambda a: a, (y_inp, m_inp)
                    )
                return (i + 1, y_inp, m_inp)

            return jax.lax.while_loop(cond, body, (jnp.asarray(0), x, m))[1]

        return run

    def inpaint_cp_host(
        self, x: np.ndarray, m: np.ndarray, N: int = 20, s: int = 1, e: float = 1.0
    ) -> np.ndarray:
        """Host-loop twin of ``inpaint_cp`` (one refine call per half-step)."""
        F = x.shape[0]
        y_inp = jnp.asarray(x)
        m_inp = jnp.asarray(m)
        idx = np.arange(F)

        for i in range(N):
            parity = [(t // s) % (s if s > 1 else 2) == i % 2 for t in range(F)]
            holes = np.asarray(jnp.sum(m_inp, axis=(1, 2, 3)))
            for delta in (-s, s):
                ref_idx = idx + delta
                valid = (ref_idx >= 0) & (ref_idx < F)
                active = np.asarray(parity) & valid & (holes > 0)
                if not active.any():
                    continue
                ref_idx_c = np.clip(ref_idx, 0, F - 1)
                x_t, m_t, comp, hole_pct = self._refine(
                    y_inp, m_inp, y_inp[jnp.asarray(ref_idx_c)],
                    m_inp[jnp.asarray(ref_idx_c)], jnp.asarray(active),
                )
                finalize = np.asarray(active) & (
                    (np.asarray(hole_pct) < e) | (i >= N - 2)
                )
                fin = jnp.asarray(finalize)[:, None, None, None]
                y_inp = jnp.where(fin, comp, x_t)
                m_inp = jnp.where(fin, 0.0, m_t)
                holes = np.asarray(jnp.sum(m_inp, axis=(1, 2, 3)))
            if not np.any(holes > 0) and i >= 1:
                break
        return np.asarray(y_inp)
