"""On-device motion-segmentation PR-sweep counts.

The reference sweeps 150 thresholds per sample on the host
(``eval/motion_segmentation.py:53-95``): for each threshold t it counts
``tp = |pred > t & gt==1|``, ``p_sum = |pred > t & gt!=3|``, ``fn = |gt==1| - tp``
— an O(T * H * W) loop per image.

TPU redesign: because the thresholds are a sorted vector, ``pred > thrds[t]``
holds exactly for ``t < searchsorted(thrds, pred, side='left')``. So one
bucketization + one histogram + one suffix-sum produces the counts for ALL
thresholds in O(H * W * log T): per pixel, bucket ``b`` = number of
thresholds strictly below ``pred``; then
``tp[t] = #{pixels in gt-mask with b > t}`` is a reversed cumulative sum of
the bucket histogram. Results are exactly equal to the per-threshold
comparisons (same float32 ``>`` semantics).

Inputs may be batch-sharded over a data mesh; the histogram reduction then
runs data-parallel with XLA inserting the final cross-device sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, donate_argnums=())
def pr_sweep_counts(pred, gt, thrds, sample_weight=None):
    """Accumulate tp/fp/fn over a batch for every threshold at once.

    :param pred:  ``(B, H, W)`` float32 motion probability in [0, 1]
    :param gt:    ``(B, H, W)`` integer labels (1=moving, 2=static, 3=unlabeled)
    :param thrds: ``(T,)`` *sorted ascending* thresholds
    :param sample_weight: optional ``(B,)`` 1/0 mask excluding padded samples
    :return: (tp, fp, fn) each ``(T,)`` float32, summed over the batch —
             identical to the reference's per-threshold counting
             (eval/motion_segmentation.py:62-73).
    """
    B = pred.shape[0]
    T = thrds.shape[0]
    if sample_weight is None:
        sample_weight = jnp.ones((B,), jnp.float32)
    w = sample_weight[:, None].astype(jnp.float32)

    gm = (gt == 1).reshape(B, -1).astype(jnp.float32) * w
    vm = (gt != 3).reshape(B, -1).astype(jnp.float32) * w

    # bucket b: number of thresholds strictly < pred  =>  pred > thrds[t] iff t < b
    b = jnp.searchsorted(thrds, pred.reshape(B, -1), side="left")  # (B, HW) in [0, T]

    def hist(mask):
        h = jax.vmap(lambda bb, mm: jnp.zeros((T + 1,), jnp.float32).at[bb].add(mm))(b, mask)
        return jnp.sum(h, axis=0)  # (T+1,)

    hg = hist(gm)
    hv = hist(vm)

    def suffix_counts(h):
        # counts[t] = sum_{b > t} h[b] for t in [0, T)
        c = jnp.cumsum(h)
        return c[-1] - c[:-1]

    tp = suffix_counts(hg)
    p_sum = suffix_counts(hv)
    g_sum = jnp.sum(hg)
    return tp, p_sum - tp, g_sum - tp
