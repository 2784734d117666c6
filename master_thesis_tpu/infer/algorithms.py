"""Full-video inpainting algorithms (TPU re-design of reference
model_chn.py:87-254).

The reference runs three Python loops that call the network once per
(frame, reference) pair with batch 1. Two of the three algorithms have no
inter-frame data dependency, so on TPU they are *vectorized over the frame
axis*: every round, one jitted ``refine`` step processes ALL frames against
their round-``k`` reference, with per-frame ``active`` masking replacing the
reference's per-frame while-loop exits. Shapes stay static (XLA-friendly);
the host only fetches one boolean per round for early termination.

- ``inpaint_ff`` (frame-by-frame, reference :87-135): independent per
  frame. Candidate order ±1, ±2, ... (distance-sorted, smaller index first)
  matches ``get_indexes_ff``; out-of-range candidates are skipped per frame
  via the active mask, frames stop once their hole < ``e``%.
- ``inpaint_ip`` (inpaint-and-propagate, reference :137-191): sequential by
  design (center-out, previously inpainted frames feed later ones) — host
  loop over frames in reference order, jitted single-frame refine inside.
- ``inpaint_cp`` (copy-and-propagate, reference :193-254): N passes over
  alternating frame parities; within a pass, active frames only read
  neighbors outside the updated set, so each (pass, ±s) half-step is one
  batched refine over all active frames.

Numerical semantics per refine step are the reference's exactly: shrink the
mask by the visibility map, refill with the composite + gray fill, stop at
hole < e% (model_chn.py:121-131).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Tuple

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


class Inpainter:
    """Drives the three algorithms over one decoded sequence.

    Args:
        chn_apply: ``(params, x_t, v_t, x_refs, v_refs, v_maps) ->
            (y_hat, y_hat_comp)``.
        chn_params: trained CHN params.
        align_fn: aligner closure over frozen params.
    """

    def __init__(self, chn_apply: Callable, chn_params, align_fn: Callable):
        self.chn_apply = chn_apply
        self.chn_params = chn_params
        self.align_fn = align_fn
        self._refine = jax.jit(self._refine_impl)

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

    # ------------------------------------------------------------------ ff

    def inpaint_ff(
        self, x: np.ndarray, m: np.ndarray, s: int = 1, D: int = 20, e: float = 1.0
    ) -> np.ndarray:
        """Frame-by-frame, vectorized over frames (reference :87-135).

        x: (F, H, W, 3); m: (F, H, W, 1). Returns (F, H, W, 3).
        """
        F = x.shape[0]
        x_tgt = jnp.asarray(x)
        m_tgt = jnp.asarray(m)
        y_out = x_tgt
        have_comp = np.zeros(F, bool)
        hole = np.full(F, np.inf, np.float32)

        offsets: List[int] = []
        for d in range(s, D + 1, s):
            offsets += [-d, d]

        idx = np.arange(F)
        for off in offsets:
            ref_idx = idx + off
            valid = (ref_idx >= 0) & (ref_idx < F)
            active = valid & (~have_comp | (hole > e))
            if not active.any():
                break
            ref_idx_c = np.clip(ref_idx, 0, F - 1)
            # ff aligns against the *original* frames, not inpainted ones
            # (reference :115-119 samples x, m — the raw sequence).
            x_ref = jnp.asarray(x)[jnp.asarray(ref_idx_c)]
            m_ref = jnp.asarray(m)[jnp.asarray(ref_idx_c)]
            x_tgt, m_tgt, comp, hole_dev = self._refine(
                x_tgt, m_tgt, x_ref, m_ref, jnp.asarray(active)
            )
            y_out = jnp.where(jnp.asarray(active)[:, None, None, None], comp, y_out)
            have_comp |= active
            hole = np.asarray(hole_dev)
        return np.asarray(y_out)

    # ------------------------------------------------------------------ ip

    def inpaint_ip(
        self, x: np.ndarray, m: np.ndarray, s: int = 1, D: int = 20, e: float = 1.0
    ) -> np.ndarray:
        """Inpaint-and-propagate (reference :137-191): center-out order,
        previously inpainted frames serve as references. Host loop (true
        sequential dependency), jitted single-frame refine inside."""
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
        self, x: np.ndarray, m: np.ndarray, N: int = 20, s: int = 1, e: float = 1.0
    ) -> np.ndarray:
        """Copy-and-propagate (reference :193-254): N alternating-parity
        passes, each half-step batched over all active frames."""
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
                # Frames done (hole < e) or in the final two passes are
                # finalized: mask zeroed, output = composite (reference
                # :250-252).
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
