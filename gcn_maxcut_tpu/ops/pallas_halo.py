"""Pallas halo-exchange banded SpMM: inter-chip RDMA overlapped with compute.

The north-star schedule (BASELINE.json) as ONE kernel: a giant banded graph
is node-sharded contiguously across the mesh, so each shard's out-of-range
neighbor rows ("halos") live exactly W rows into its ring neighbors.  Per
device, the kernel

  1. immediately starts two remote DMAs over the interconnect: its first W
     rows to the left neighbor's ``halo_post`` buffer and its last W rows to
     the right neighbor's ``halo_pre`` buffer (symmetric SPMD ring, so the
     matching incoming copies target this device's own halo buffers);
  2. computes interior row blocks — windowed local HBM DMAs, double-buffered
     exactly like ``pallas_banded`` — while the halos are in flight;
  3. waits the pre-halo only when block 0 executes and the post-halo only at
     the last block, so communication hides behind the interior sweep.

This is the message-passing analog of ring attention's compute/comm overlap,
expressed with ``make_async_remote_copy`` + DMA semaphores.  Semantics are
validated under ``pltpu.force_tpu_interpret_mode`` on the virtual CPU mesh
(which simulates remote DMAs); the same program targets real ICI on a TPU
slice.

Hardware status (round 1): only a single chip was available.  A D=1 mesh
routes to the plain circulant kernel (loopback RDMA faults the real TPU
runtime even though the interpret simulator accepts it); the multi-chip
RDMA path is interpret-validated and awaits a real slice for hardware
validation.

Layout contract: global node i lives on shard i // n_shard at local row
i mod n_shard (contiguous partition), and edges are circulant offsets
|o| ≤ W ≤ block ≤ n_shard.  Weights are per-row ``w[n_shard, D]`` (zeros on
padded rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.ops.pallas_banded import DEFAULT_BLOCK, _interpreting


def _halo_kernel(
    offsets, B, Wp, F, n_blocks, axis_name,
    w_ref, x_hbm, send_r_hbm, send_l_hbm, out_ref,
    scratch, halo_pre, halo_post, local_sems, send_sems, recv_sems,
):
    """Weighted halo SpMM body: fused-DMA interior sweep + RDMA boundary
    rows.  All row slices are 8-sublane aligned (W rounded up to Wp; send
    tiles staged outside the kernel), matching the Mosaic DMA alignment
    rules the single-chip kernels follow."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)
    my = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)

    # incoming copy into MY halo_pre comes from my left neighbor's send of
    # its last Wp rows; symmetric SPMD lets each device describe the pair.
    def send_to_right():
        return pltpu.make_async_remote_copy(
            src_ref=send_r_hbm,
            dst_ref=halo_pre,
            send_sem=send_sems.at[0],
            recv_sem=recv_sems.at[0],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def send_to_left():
        return pltpu.make_async_remote_copy(
            src_ref=send_l_hbm,
            dst_ref=halo_post,
            send_sem=send_sems.at[1],
            recv_sem=recv_sems.at[1],
            device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # local window DMAs: ONE fused copy for interior blocks; the halo rows
    # of the first/last block arrive by RDMA instead
    def mid0_dma(s):
        length = B + (Wp if n_blocks > 1 else 0)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, length), :],
            scratch.at[s, pl.ds(Wp, length), :],
            local_sems.at[s, 0],
        )

    def interior_dma(bi, s):
        base = pl.multiple_of(bi * B, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(base - Wp, 8), B + 2 * Wp), :],
            scratch.at[s],
            local_sems.at[s, 1],
        )

    def last_dma(bi, s):
        base = pl.multiple_of(bi * B, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(base - Wp, 8), B + Wp), :],
            scratch.at[s, pl.ds(0, B + Wp), :],
            local_sems.at[s, 2],
        )

    def act(bi, s, go):
        if n_blocks == 1:
            go(mid0_dma(s))
            return

        @pl.when(bi == 0)
        def _():
            go(mid0_dma(s))

        @pl.when(jnp.logical_and(bi > 0, bi < n_blocks - 1))
        def _():
            go(interior_dma(bi, s))

        @pl.when(bi == n_blocks - 1)
        def _():
            go(last_dma(bi, s))

    @pl.when(i == 0)
    def _():
        # fire the halo exchange first so it overlaps the interior sweep
        send_to_right().start()
        send_to_left().start()
        act(0, 0, lambda c: c.start())

    @pl.when(i + 1 < n_blocks)
    def _():
        act(i + 1, nxt_slot, lambda c: c.start())

    act(i, slot, lambda c: c.wait())

    # halo waits only where needed: block 0 needs the pre halo, the last
    # block needs the post halo (send completion is implied by .wait()).
    @pl.when(i == 0)
    def _():
        send_to_right().wait()
        scratch[slot, 0:Wp, :] = halo_pre[:]

    @pl.when(i + 1 == n_blocks)
    def _():
        send_to_left().wait()
        scratch[slot, Wp + B : Wp + B + Wp, :] = halo_post[:]

    x_win = scratch[slot]
    # f32 accumulation; bf16 windows promote via the f32 weight multiply
    acc = jnp.zeros((B, F), jnp.float32)
    for k, o in enumerate(offsets):
        acc = acc + w_ref[:, k : k + 1] * x_win[Wp + o : Wp + o + B, :]
    out_ref[:] = acc.astype(out_ref.dtype)


def halo_banded_spmm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    offsets: tuple[int, ...],
    axis_name: str = "graph",
    block: int = DEFAULT_BLOCK,
    collective_id: int | None = None,
) -> jnp.ndarray:
    """Node-sharded banded SpMM with RDMA halo exchange (call inside
    ``shard_map``).  ``x``: this shard's ``[n_shard, F]`` rows; returns the
    shard's aggregated rows.  Requires ``W ≤ block ≤ n_shard`` and
    ``n_shard % block == 0``.
    """
    n_local, F = x.shape
    D = len(offsets)
    W = int(max(abs(o) for o in offsets))
    Wp = (W + 7) // 8 * 8        # 8-sublane-aligned halo width
    if n_local % block:
        raise ValueError(f"n_shard={n_local} must be a multiple of {block}")
    if block % 8:
        raise ValueError(f"block={block} must be a multiple of 8")
    if Wp > block:
        raise ValueError(f"bandwidth {W} (padded {Wp}) must be <= block={block}")
    # Single-device mesh: loopback RDMA faults the real TPU runtime (the
    # interpret simulator accepts it); the wrap semantics are exactly the
    # circulant kernel, so use it directly.
    if int(jax.lax.axis_size(axis_name)) == 1:
        from gcn_maxcut_tpu.ops.pallas_banded import _banded_spmm_raw

        if x.dtype != jnp.float32:
            # the weighted circulant kernel is f32-only (exactness
            # contract); match the halo kernel's bf16-stream semantics
            return _banded_spmm_raw(
                x.astype(jnp.float32), w, offsets, block
            ).astype(x.dtype)
        return _banded_spmm_raw(x, w, offsets, block)
    if F % 128 and not _interpreting():
        # Mosaic DMA slices need 128-aligned lanes on real hardware (the
        # k=3 class dim would fail to compile on a real slice).  Zero-pad
        # the feature dim — exact, if bandwidth-wasteful; the full-bandwidth
        # narrow-F path is ``halo_banded_spmm_unit_packed`` below (used by
        # ``parallel.giant_banded.train_halo_giant_packed``).
        pad = 128 - F % 128
        xp = jnp.pad(x, ((0, 0), (0, pad)))
        return halo_banded_spmm(
            xp, w, offsets, axis_name, block, collective_id
        )[:, :F]
    n_blocks = n_local // block

    # staged boundary tiles: single contiguous aligned sources for the RDMA
    send_r = x[n_local - Wp :]
    send_l = x[:Wp]
    kernel = functools.partial(
        _halo_kernel, tuple(offsets), block, Wp, F, n_blocks, axis_name
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_local, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * Wp, F), x.dtype),      # window
            pltpu.VMEM((Wp, F), x.dtype),                     # halo_pre
            pltpu.VMEM((Wp, F), x.dtype),                     # halo_post
            pltpu.SemaphoreType.DMA((2, 3)),                  # local window
            pltpu.SemaphoreType.DMA((2,)),                    # send sems
            pltpu.SemaphoreType.DMA((2,)),                    # recv sems
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024,
            **({"collective_id": collective_id} if collective_id is not None else {}),
        ),
    )(w, x, send_r, send_l)


# ---- packed interleaved-order halo kernel (full-bandwidth narrow F) ------
#
# The plain halo kernel above needs F % 128 == 0 lanes on real hardware and
# zero-pads narrower widths (the k=3 class dim would move ~42x its real
# bytes).  The single-chip fix is the interleaved node order of
# ``ops.pallas_banded.banded_spmm_unit_packed``: store node u·m + j at
# position j·r + u, so the packed [m, r·F] view turns every circulant node
# shift into a row shift.  This is its multi-chip analog: the packed rows
# are node-sharded contiguously across the ring, boundary rows travel by
# RDMA exactly like the plain halo kernel, and the single global wrap
# (device D-1 <-> device 0) is where the lane groups rotate by F — applied
# on the SENDER's staged tile (cheap [W, r·F] XLA op), so the kernel body
# never rotates lanes.


def _packed_halo_kernel(
    offsets, B, Wp, L, n_blocks, axis_name,
    x_hbm, send_r_hbm, send_l_hbm, out_ref,
    scratch, halo_pre, halo_post, local_sems, send_sems, recv_sems,
):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)
    my = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)

    def send_to_right():
        # my last Wp rows (pre-rotated if I'm the wrap edge) -> right
        # neighbor's halo_pre; symmetric SPMD: the matching incoming copy
        # fills MY halo_pre and signals my recv semaphore.
        return pltpu.make_async_remote_copy(
            src_ref=send_r_hbm,
            dst_ref=halo_pre,
            send_sem=send_sems.at[0],
            recv_sem=recv_sems.at[0],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def send_to_left():
        return pltpu.make_async_remote_copy(
            src_ref=send_l_hbm,
            dst_ref=halo_post,
            send_sem=send_sems.at[1],
            recv_sem=recv_sems.at[1],
            device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # local window DMAs, fused single copy for interior blocks
    def mid0_dma(s):
        # block 0: rows [0, B + min(Wp, tail)) — the pre piece arrives by RDMA
        length = B + (Wp if n_blocks > 1 else 0)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, length), :],
            scratch.at[s, pl.ds(Wp, length), :],
            local_sems.at[s, 0],
        )

    def interior_dma(bi, s):
        base = pl.multiple_of(bi * B, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(base - Wp, 8), B + 2 * Wp), :],
            scratch.at[s],
            local_sems.at[s, 1],
        )

    def last_dma(bi, s):
        base = pl.multiple_of(bi * B, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(base - Wp, 8), B + Wp), :],
            scratch.at[s, pl.ds(0, B + Wp), :],
            local_sems.at[s, 2],
        )

    def start(bi, s):
        if n_blocks == 1:
            mid0_dma(s).start()
        else:
            @pl.when(bi == 0)
            def _():
                mid0_dma(s).start()

            @pl.when(jnp.logical_and(bi > 0, bi < n_blocks - 1))
            def _():
                interior_dma(bi, s).start()

            @pl.when(bi == n_blocks - 1)
            def _():
                last_dma(bi, s).start()

    def wait(bi, s):
        if n_blocks == 1:
            mid0_dma(s).wait()
        else:
            @pl.when(bi == 0)
            def _():
                mid0_dma(s).wait()

            @pl.when(jnp.logical_and(bi > 0, bi < n_blocks - 1))
            def _():
                interior_dma(bi, s).wait()

            @pl.when(bi == n_blocks - 1)
            def _():
                last_dma(bi, s).wait()

    @pl.when(i == 0)
    def _():
        send_to_right().start()
        send_to_left().start()
        start(0, 0)

    @pl.when(i + 1 < n_blocks)
    def _():
        start(i + 1, nxt_slot)

    wait(i, slot)

    @pl.when(i == 0)
    def _():
        send_to_right().wait()
        scratch[slot, 0:Wp, :] = halo_pre[:]

    @pl.when(i + 1 == n_blocks)
    def _():
        send_to_left().wait()
        scratch[slot, Wp + B : Wp + B + Wp, :] = halo_post[:]

    x_win = scratch[slot]
    # f32 accumulation over (possibly bf16) streamed windows — same
    # contract as the single-chip unit kernels (round 4: bf16 halves the
    # byte-based pallas stream ceiling at HBM-resident sizes)
    acc = jnp.zeros((B, L), jnp.float32)
    for o in offsets:
        acc = acc + x_win[Wp + o : Wp + o + B, :].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _packed_halo_xla(p, offsets, r, F, axis_name):
    """XLA ppermute fallback/reference: same sharded packed semantics with
    collectives instead of in-kernel RDMA.  ``p``: [m_loc, L]."""
    m_loc, L = p.shape
    W = int(max(abs(o) for o in offsets))
    n_dev = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    fwd = [(j, (j + 1) % n_dev) for j in range(n_dev)]
    bwd = [(j, (j - 1) % n_dev) for j in range(n_dev)]
    up_tile = p[m_loc - W :]
    up_tile = jnp.where(my == n_dev - 1, jnp.roll(up_tile, F, axis=1), up_tile)
    pre = jax.lax.ppermute(up_tile, axis_name, fwd)
    down_tile = p[:W]
    down_tile = jnp.where(my == 0, jnp.roll(down_tile, -F, axis=1), down_tile)
    post = jax.lax.ppermute(down_tile, axis_name, bwd)
    win = jnp.concatenate([pre, p, post], axis=0)
    out = jnp.zeros_like(p)
    for o in offsets:
        out = out + jax.lax.dynamic_slice_in_dim(win, W + o, m_loc, axis=0)
    return out


def _halo_packed_raw(x, offsets, r, axis_name, block, collective_id):
    n_loc, F = x.shape
    if n_loc % r:
        raise ValueError(f"n_loc={n_loc} must be a multiple of r={r}")
    m_loc = n_loc // r
    L = r * F
    W = int(max(abs(o) for o in offsets))
    Wp = (W + 7) // 8 * 8
    if int(jax.lax.axis_size(axis_name)) == 1:
        from gcn_maxcut_tpu.ops.pallas_banded import _banded_spmm_unit_packed_raw

        return _banded_spmm_unit_packed_raw(x, offsets, r, block)
    p = x.reshape(m_loc, L)
    from gcn_maxcut_tpu.ops.pallas_banded import _auto_block

    blk = block or _auto_block(m_loc, L, Wp)
    usable = (
        L % 128 == 0
        and blk is not None
        and m_loc % blk == 0
        and Wp <= blk
        and 2 * Wp <= m_loc
    )
    if not usable:
        return _packed_halo_xla(p, offsets, r, F, axis_name).reshape(n_loc, F)

    my = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    # staged send tiles; the wrap edge rotates lane groups by F on the
    # sender so halo rows land compute-ready
    send_r = p[m_loc - Wp :]
    send_r = jnp.where(my == n_dev - 1, jnp.roll(send_r, F, axis=1), send_r)
    send_l = p[:Wp]
    send_l = jnp.where(my == 0, jnp.roll(send_l, -F, axis=1), send_l)

    n_blocks = m_loc // blk
    kernel = functools.partial(
        _packed_halo_kernel, tuple(offsets), blk, Wp, L, n_blocks, axis_name
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (blk, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_loc, L), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, blk + 2 * Wp, L), x.dtype),        # window
            pltpu.VMEM((Wp, L), x.dtype),                     # halo_pre
            pltpu.VMEM((Wp, L), x.dtype),                     # halo_post
            pltpu.SemaphoreType.DMA((2, 3)),                  # local window
            pltpu.SemaphoreType.DMA((2,)),                    # send sems
            pltpu.SemaphoreType.DMA((2,)),                    # recv sems
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # 64 MB, NOT more: an oversized scoped-vmem limit makes the
            # scheduler ~2.5x slower (measured on the single-chip kernel)
            vmem_limit_bytes=64 * 1024 * 1024,
            **({"collective_id": collective_id} if collective_id is not None else {}),
        ),
    )(p, send_r, send_l)
    return out.reshape(n_loc, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def halo_banded_spmm_unit_packed(
    x: jnp.ndarray,
    offsets: tuple[int, ...],
    r: int,
    axis_name: str = "graph",
    block: int | None = None,
    collective_id: int | None = None,
) -> jnp.ndarray:
    """Node-sharded unit-weight circulant SpMM on interleaved-packed arrays
    (call inside ``shard_map``): full stream bandwidth for ANY feature
    width with r·F % 128 == 0.

    ``x``: this shard's [n_loc, F] rows in interleaved position order; the
    global packed [m, r·F] matrix is row-sharded contiguously, so shard c's
    positions are [c·n_loc, (c+1)·n_loc).  Boundary rows travel by RDMA
    overlapped with the interior sweep; the global wrap's lane-group
    rotation is staged on the sender.  Backward = same kernel, negated
    offsets (self-adjoint for the symmetric ±o shift sets).
    """
    return _halo_packed_raw(x, offsets, r, axis_name, block, collective_id)


def _halo_packed_fwd(x, offsets, r, axis_name, block, collective_id):
    return _halo_packed_raw(x, offsets, r, axis_name, block, collective_id), None


def _halo_packed_bwd(offsets, r, axis_name, block, collective_id, _, dy):
    neg = tuple(-o for o in offsets)
    return (_halo_packed_raw(dy, neg, r, axis_name, block, collective_id),)


halo_banded_spmm_unit_packed.defvjp(_halo_packed_fwd, _halo_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def halo_banded_spmm_unit(
    x: jnp.ndarray,
    offsets: tuple[int, ...],
    axis_name: str = "graph",
    block: int = DEFAULT_BLOCK,
    collective_id: int | None = None,
) -> jnp.ndarray:
    """Unit-weight halo SpMM, differentiable in x.

    The global circulant operator with unit weights is A = Σ_k S_{o_k};
    its transpose is the same form with negated offsets, which is again a
    halo SpMM — so the backward pass reuses the kernel (and for symmetric
    shift sets ±o the operator is self-adjoint).
    """
    w = jnp.ones((x.shape[0], len(offsets)), jnp.float32)
    return halo_banded_spmm(x, w, offsets, axis_name, block, collective_id)


def _halo_unit_fwd(x, offsets, axis_name, block, collective_id):
    return halo_banded_spmm_unit(x, offsets, axis_name, block, collective_id), None


def _halo_unit_bwd(offsets, axis_name, block, collective_id, _, dy):
    neg = tuple(-o for o in offsets)
    return (halo_banded_spmm_unit(dy, neg, axis_name, block, collective_id),)


halo_banded_spmm_unit.defvjp(_halo_unit_fwd, _halo_unit_bwd)
