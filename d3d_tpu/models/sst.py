"""SST-style single-stride sparse window transformer — fifth model family.

The reference devkit (cmpute/d3d) ships no models at all (it is the
toolchain; see models/pointpillars.py); this family goes beyond parity
with a transformer detector designed for the MXU: pillar tokens are
grouped into BEV windows and run through windowed multi-head attention —
dense (window, K, C) einsums that map straight onto the systolic array —
instead of a strided conv pyramid. Detection stays at the full grid
resolution (the "single stride" of the title), which is what makes the
family strong on small objects (pedestrians/cyclists).

TPU-first design choices:

  * fixed shapes everywhere: every window holds exactly ``capacity``
    token slots (real tokens masked in attention; overflow pillars — rare
    at sane capacities — skip the transformer through their residual
    path) instead of the paper's dynamic per-window bucketing;
  * the pillar->slot routing is the same gather formulation as the BEV
    scatter (models/pointpillars.py:_bev_gather): one small int32 scatter
    builds the inverse slot table, then tokens/detokens are pure gathers;
  * window membership and in-window ranks come from one stable sort +
    ``cummax`` segment arithmetic — no hash maps, no searchsorted;
  * alternating shifted windows (Swin-style) give cross-window mixing
    without any halo code.

The config extends PointPillarsConfig, and ``__call__`` matches the
PointPillars signature/output contract exactly, so the whole training
(make_train_step, prepare_targets), inference (make_sst_detector =
anchor factory), sharding (dp/sp/tp + spatial_constrain on the final BEV
canvas) and evaluation stack is reused unchanged.

Reference: Fan et al., "Embracing Single Stride 3D Object Detector with
Sparse Transformer", CVPR 2022 (arXiv:2112.06375); window shifting from
Liu et al., Swin Transformer (ICCV 2021).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .pointpillars import (PointPillarsConfig, _PFN, _ConvBlock,
                           scatter_to_bev)

__all__ = ["SSTConfig", "SST", "window_slots", "pipeline_sst_trunk",
           "route_tokens", "detok_tokens"]


@dataclass(frozen=True)
class SSTConfig(PointPillarsConfig):
    """PointPillars-compatible static config + transformer knobs.

    ``grid`` must be divisible by ``window``; capacity bounds the tokens
    attending per window (64 covers a 8x8-cell KITTI window comfortably:
    pillars are sparse, ~12k over a 432x496 grid)."""

    window: int = 8           # window edge, in BEV cells
    capacity: int = 64        # token slots per window
    depth: int = 4            # transformer blocks (alternating shift)
    num_heads: int = 4
    mlp_ratio: int = 2
    neck_channels: int = 128  # post-transformer BEV conv neck
    moe_experts: int = 0      # >0: Switch-MoE MLP with this many experts
    moe_capacity: float = 1.25
    moe_group: int = 4096     # tokens per routing group (dispatch memory
                              # scales with tokens x group, keep bounded)
    moe_aux_weight: float = 0.01  # load-balance loss weight (train step)
    remat_blocks: bool = False    # checkpoint each _WindowBlock: backward
                                  # recomputes the block, so trunk activation
                                  # memory is one block deep instead of
                                  # `depth` (the whole-forward remat= in
                                  # make_train_step uses a dots-saveable
                                  # policy that KEEPS attention logits and
                                  # expert MLP intermediates — for a
                                  # transformer those ARE the big buffers,
                                  # so per-block remat is the lever here)


@partial(jax.jit, static_argnames=("grid", "window", "capacity", "shift"))
def window_slots(coords, valid, grid, window, capacity, shift=False):
    """Token-slot assignment of pillars to BEV windows.

    :param coords: (P, 2) int32 pillar cells; ``valid`` (P,) mask
    :param grid: static (W, H); ``window`` the window edge in cells
    :param shift: offset windows by window//2 (Swin alternation); the
        shifted tiling is laid over the grid padded by one window so the
        border cells still land in complete windows
    :returns: (slot (P,) int32 in [0, n_windows*capacity) or the trash
        slot n_windows*capacity; inv (n_windows*capacity,) int32 pillar
        row per slot, P for empty) — ``inv`` makes tokenization a gather
        and ``slot`` makes detokenization a gather, mirroring the BEV
        scatter's formulation.
    """
    p = coords.shape[0]
    w, h = grid
    off = window // 2 if shift else 0
    nwx = (w + off + window - 1) // window
    nwy = (h + off + window - 1) // window
    n_windows = nwx * nwy

    ix = coords[:, 0] + off
    iy = coords[:, 1] + off
    wid = (ix // window) * nwy + (iy // window)
    big = jnp.int32(n_windows)
    wid_key = jnp.where(valid, wid, big).astype(jnp.int32)

    # stable sort by window id; in-window rank = index - segment start
    order = jnp.argsort(wid_key, stable=True)
    sw = wid_key[order]
    ar = jnp.arange(p, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), sw[1:] != sw[:-1]])
    start = jax.lax.cummax(jnp.where(first, ar, 0))
    rank_sorted = ar - start
    rank = jnp.zeros(p, jnp.int32).at[order].set(rank_sorted)

    keep = valid & (rank < capacity)
    trash = jnp.int32(n_windows * capacity)
    slot = jnp.where(keep, wid * capacity + rank, trash)
    inv = jnp.full(n_windows * capacity + 1, p, jnp.int32)
    inv = inv.at[slot].set(ar)  # trash writes land in the overflow row
    return slot, inv[:-1]




def route_tokens(pf, inv, capacity):
    """Tokenize pillars into window slots: gather rows of ``pf`` by the
    ``inv`` slot table ((B, L) with L a multiple of ``capacity``; value P
    = empty slot). Returns tok (B, L/cap, cap, C), tmask."""
    b, p, c = pf.shape
    nw = inv.shape[1] // capacity
    pf_pad = jnp.concatenate(
        [pf, jnp.zeros((b, 1, c), pf.dtype)], axis=1)
    tok = jnp.take_along_axis(pf_pad, inv[..., None], axis=1)
    return (tok.reshape(b, nw, capacity, c),
            (inv < p).reshape(b, nw, capacity))


def detok_tokens(pf, tok, slot, nwcap):
    """Scatter window tokens back to pillar rows via the ``slot`` table;
    pillars with ``slot >= nwcap`` (overflow/trash) keep their residual
    ``pf``. ``nwcap`` is this tiling's n_windows * capacity — with an
    inv table PADDED beyond it (the pipeline's homogeneous-shape trick)
    the trash slot may alias a padding token, which this mask drops."""
    b, p, c = pf.shape
    tok_flat = jnp.concatenate(
        [tok.reshape(b, -1, c), jnp.zeros((b, 1, c), tok.dtype)], axis=1)
    idx = jnp.minimum(slot, tok_flat.shape[1] - 1)
    upd = jnp.take_along_axis(tok_flat, idx[..., None], axis=1)
    return jnp.where((slot < nwcap)[..., None], upd, pf)


class _WindowBlock(nn.Module):
    """Pre-norm windowed MHSA + MLP on (B, Nw, K, C) token grids.

    ``moe_experts > 0`` swaps the dense MLP for a Switch-MoE
    (:func:`d3d_tpu.parallel.moe.moe_mlp`) — run on COMPACT PILLAR ROWS,
    not on the padded window-slot grid: the MLP is pointwise and
    detokenization is a permutation of the real tokens, so routing after
    detok is the same math while the dispatch tensors scale with the
    ~12k real pillars instead of the ~214k window slots (an 18x compiled-
    memory cut at sst_kitti scale — measured 172 GB -> single-digit GB by
    scripts/aot_parallel_scale.py). The caller passes
    ``pillar=(pf, valid, slot, nwcap)`` and receives the UPDATED PILLAR
    FEATURES instead of tokens; overflow pillars (no window slot) now
    also get the expert MLP, which only adds coverage. The load-balance
    aux is sown into ``losses`` (picked up by ``make_train_step``) and
    ``moe_constrain`` (:func:`~d3d_tpu.parallel.mesh.expert_constrain`)
    shards the expert compute over an ``ep`` mesh axis."""

    num_heads: int
    mlp_ratio: int
    dtype: str
    moe_experts: int = 0
    moe_capacity: float = 1.25
    moe_group: int = 4096
    moe_constrain: Callable = None

    @nn.compact
    def __call__(self, tok, tmask, pillar=None):
        dt = jnp.dtype(self.dtype)
        c = tok.shape[-1]
        hd = c // self.num_heads

        # LayerNorm in the compute dtype (stats stay f32 inside flax):
        # the pinned-f32 version round-tripped every token tensor through
        # f32 before the cast-back at the next Dense
        y = nn.LayerNorm(dtype=dt)(tok)
        qkv = nn.Dense(3 * c, dtype=dt, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(*t.shape[:-1], self.num_heads, hd)
        q, k, v = split(q), split(k), split(v)
        # (B, Nw, heads, K, K) window-local attention — dense MXU matmuls
        logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k) / np.sqrt(hd)
        logits = jnp.where(tmask[:, :, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn.astype(dt), v)
        out = out.reshape(*tok.shape[:-1], c)
        tok = tok + nn.Dense(c, dtype=dt, name="proj")(out)

        if self.moe_experts:
            from ..parallel.moe import moe_mlp

            assert pillar is not None, \
                "MoE blocks route on pillar rows: pass pillar=(pf, valid," \
                " slot, nwcap)"
            pf, valid, slot, nwcap = pillar
            pf = detok_tokens(pf, tok, slot, nwcap)
            e, h = self.moe_experts, self.mlp_ratio * c
            init = nn.initializers.lecun_normal()
            p = {
                "router": self.param("moe_router", init, (c, e), jnp.float32),
                "w1": self.param("moe_w1", init, (e, c, h), jnp.float32),
                "b1": self.param("moe_b1", nn.initializers.zeros, (e, h), jnp.float32),
                "w2": self.param("moe_w2", init, (e, h, c), jnp.float32),
                "b2": self.param("moe_b2", nn.initializers.zeros, (e, c), jnp.float32),
            }
            p = {k: v.astype(dt) if k != "router" else v
                 for k, v in p.items()}
            y = nn.LayerNorm(dtype=dt)(pf)
            y2, aux = moe_mlp(p, y, self.moe_capacity,
                              mask=valid, constrain=self.moe_constrain,
                              group_size=self.moe_group)
            self.sow("losses", "moe_aux", aux)
            return pf + y2  # y2 is already zero on invalid rows
        y = nn.LayerNorm(dtype=dt)(tok)
        y = nn.Dense(self.mlp_ratio * c, dtype=dt, name="mlp1")(y)
        y = nn.Dense(c, dtype=dt, name="mlp2")(nn.gelu(y))
        return tok + y


class SST(nn.Module):
    """PFN -> windowed transformer (alternating shift) -> single-stride
    BEV neck -> SSD head. Same input/output contract as
    :class:`~d3d_tpu.models.pointpillars.PointPillars`, so the training,
    detector-factory, export and mesh-sharding stack is shared.
    ``constrain`` is the optional activation-sharding hook
    (:func:`d3d_tpu.parallel.spatial_constrain`) applied to the BEV
    canvas stage."""

    cfg: SSTConfig
    constrain: Callable = None
    moe_constrain: Callable = None
    # "embed" returns the post-PFN/pos-embed pillar features, "trunk"
    # the features after the windowed-transformer stack (pre-mask) —
    # the split points :func:`pipeline_sst_trunk` validates against
    stage: str = "full"

    @nn.compact
    def __call__(self, features, coords, valid, train: bool = False):
        cfg = self.cfg
        con = self.constrain or (lambda x, kind: x)
        b = features.shape[0]
        dt = jnp.dtype(cfg.dtype)
        c = cfg.pfn_features

        pmask = jnp.any(features != 0, axis=-1)
        pf = _PFN(c, cfg.dtype)(features, pmask, train)
        pf = pf * valid[..., None].astype(pf.dtype)     # (B, P, C)

        # learned positional embedding of the in-window cell offset
        # (shared across the alternating tilings: offsets mod window)
        cell = jnp.mod(coords, cfg.window).astype(dt) / cfg.window
        pf = pf + nn.Dense(c, dtype=dt, name="pos_embed")(cell)
        if self.stage == "embed":
            return pf

        block_cls = _WindowBlock
        if cfg.remat_blocks:
            # static_argnums: `pillar` is a pytree of arrays (fine), but
            # flax's lifted remat must not trace `train`-style Python
            # bools — _WindowBlock takes none, so the default is safe.
            block_cls = nn.remat(_WindowBlock, prevent_cse=False)
        for d in range(cfg.depth):
            shift = bool(d % 2)
            slot, inv = jax.vmap(
                lambda cd, vl: window_slots(cd, vl, cfg.grid, cfg.window,
                                            cfg.capacity, shift)
            )(coords, valid)
            tok, tmask = route_tokens(pf, inv, cfg.capacity)
            blk = block_cls(cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                               moe_experts=cfg.moe_experts,
                               moe_capacity=cfg.moe_capacity,
                               moe_group=cfg.moe_group,
                               moe_constrain=self.moe_constrain,
                               name=f"block{d}")
            if cfg.moe_experts:
                # MoE blocks detok internally and route the expert MLP on
                # the compact pillar rows (see _WindowBlock docstring)
                pf = blk(tok, tmask, pillar=(pf, valid, slot, inv.shape[1]))
            else:
                tok = blk(tok, tmask)
                # detokenize: slot gather; overflow pillars keep their
                # residual-path features (slot == trash reads the zero row)
                pf = detok_tokens(pf, tok, slot, inv.shape[1])
        if self.stage == "trunk":
            return pf
        pf = pf * valid[..., None].astype(pf.dtype)

        # single-stride BEV neck + SSD head (full-resolution detection)
        x = con(scatter_to_bev(pf, coords, valid, cfg.grid), "bev")
        x = con(_ConvBlock(cfg.neck_channels, 2, 1, cfg.dtype)(x, train),
                "bev")

        a = cfg.num_anchors_per_cell
        cls_logits = nn.Conv(a * cfg.num_classes, (1, 1), dtype=dt,
                             name="head_cls")(x)
        box_preds = nn.Conv(a * 7, (1, 1), dtype=dt, name="head_box")(x)
        dir_logits = nn.Conv(a * 2, (1, 1), dtype=dt, name="head_dir")(x)
        wh = x.shape[1] * x.shape[2]
        return (
            cls_logits.reshape(b, wh * a, cfg.num_classes).astype(jnp.float32),
            box_preds.reshape(b, wh * a, 7).astype(jnp.float32),
            dir_logits.reshape(b, wh * a, 2).astype(jnp.float32),
        )


def pipeline_sst_trunk(variables, cfg: SSTConfig, mesh, pf_mb, coords_mb,
                       valid_mb, batch_axis=None, axis="pp"):
    """Run a trained SST's windowed-transformer trunk PIPELINED over the
    mesh's pipeline axis (the realistic pp workload: ``cfg.depth``
    shape-homogeneous blocks, one contiguous chunk per rank).

    Per-depth state = that block's params + its routing tables per
    microbatch (the alternating-shift tilings differ, so the ``inv``
    tables pad to the larger tiling and ``detok_tokens``' ``nwcap`` mask
    drops the padding — see the helper docstrings). The load-balance
    sow of an MoE trunk is a no-op here (inference path).

    :param pf_mb: (M, mb, P, C) post-embed features from
        ``SST(cfg, stage="embed").apply(variables, ...)``, microbatched
    :param coords_mb / valid_mb: (M, mb, P, 2) / (M, mb, P)
    :returns: (M, mb, P, C) trunk outputs == 
        ``SST(cfg, stage="trunk")`` on the same inputs
    """
    from ..parallel.pipeline import pipeline_apply

    depth = cfg.depth
    # only TWO distinct tilings exist (shift alternates with d % 2):
    # sort once per parity, stack per depth (the stacking is what makes
    # the stage state shape-homogeneous across ranks)
    par = []
    for shift in (False, True)[:min(depth, 2)]:
        sl, iv = jax.vmap(jax.vmap(
            lambda cd, vl: window_slots(cd, vl, cfg.grid, cfg.window,
                                        cfg.capacity, shift)
        ))(coords_mb, valid_mb)
        par.append((sl, iv, iv.shape[-1]))
    L = max(p[2] for p in par)
    p = pf_mb.shape[-2]
    pad = lambda iv: jnp.concatenate(
        [iv, jnp.full(iv.shape[:-1] + (L - iv.shape[-1],), p, iv.dtype)],
        axis=-1)
    state = dict(
        params=jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[variables["params"][f"block{d}"] for d in range(depth)]),
        slot=jnp.stack([par[d % 2][0] for d in range(depth)]),
        inv=jnp.stack([pad(par[d % 2][1]) for d in range(depth)]),
        nwcap=jnp.asarray([par[d % 2][2] for d in range(depth)],
                          jnp.int32),
    )
    if cfg.moe_experts:
        # the expert MLP routes on pillar rows and masks by validity —
        # carry the (M, mb, P) mask as per-depth stage state like the
        # routing tables (it shards its microbatch dim the same way)
        state["valid"] = jnp.stack([valid_mb] * depth)
    block = _WindowBlock(cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                         moe_experts=cfg.moe_experts,
                         moe_capacity=cfg.moe_capacity,
                         moe_group=cfg.moe_group)

    def stage(st, pf, mb):
        sl = jax.lax.dynamic_index_in_dim(st["slot"], mb, 0,
                                          keepdims=False)
        iv = jax.lax.dynamic_index_in_dim(st["inv"], mb, 0,
                                          keepdims=False)
        tok, tmask = route_tokens(pf, iv, cfg.capacity)
        if cfg.moe_experts:
            vl = jax.lax.dynamic_index_in_dim(st["valid"], mb, 0,
                                              keepdims=False)
            return block.apply({"params": st["params"]}, tok, tmask,
                               pillar=(pf, vl, sl, st["nwcap"]))
        tok = block.apply({"params": st["params"]}, tok, tmask)
        return detok_tokens(pf, tok, sl, st["nwcap"])

    from jax.sharding import PartitionSpec as P

    # routing tables carry the microbatch dim (axis 2): shard it over
    # the batch axis alongside the activations
    specs = dict(
        params=jax.tree.map(lambda _: P(axis), state["params"]),
        slot=P(axis, None, batch_axis),
        inv=P(axis, None, batch_axis),
        nwcap=P(axis),
    )
    if cfg.moe_experts:
        specs["valid"] = P(axis, None, batch_axis)
    return pipeline_apply(stage, state, pf_mb, mesh, axis=axis,
                          batch_axis=batch_axis, state_specs=specs)
