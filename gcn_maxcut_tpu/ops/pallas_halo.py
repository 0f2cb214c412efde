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
    offsets, B, W, F, n_blocks, axis_name,
    w_ref, x_hbm, out_ref,
    scratch, halo_pre, halo_post, local_sems, send_sems, recv_sems,
):
    i = pl.program_id(0)
    n_local = n_blocks * B
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)
    my = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)

    # incoming copy into MY halo_pre comes from my left neighbor's send of
    # its last W rows; symmetric SPMD lets each device describe the pair.
    def send_to_right():
        return pltpu.make_async_remote_copy(
            src_ref=x_hbm.at[pl.ds(n_local - W, W), :],
            dst_ref=halo_pre,
            send_sem=send_sems.at[0],
            recv_sem=recv_sems.at[0],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def send_to_left():
        return pltpu.make_async_remote_copy(
            src_ref=x_hbm.at[pl.ds(0, W), :],
            dst_ref=halo_post,
            send_sem=send_sems.at[1],
            recv_sem=recv_sems.at[1],
            device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # local window pieces (everything except the two remote halo rows)
    def dmas(block_idx, into_slot):
        base = block_idx * B
        copies = [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(base, B), :],
                scratch.at[into_slot, pl.ds(W, B), :],
                local_sems.at[into_slot, 0],
            )
        ]
        return copies

    def pre_dma(block_idx, into_slot):
        # rows [base - W, base) — local for every block except block 0
        base = block_idx * B
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(jnp.maximum(base - W, 0), W), :],
            scratch.at[into_slot, pl.ds(0, W), :],
            local_sems.at[into_slot, 1],
        )

    def post_dma(block_idx, into_slot):
        # rows [base + B, base + B + W) — local except for the last block
        base = block_idx * B
        start = jnp.minimum(base + B, n_local - W)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, W), :],
            scratch.at[into_slot, pl.ds(W + B, W), :],
            local_sems.at[into_slot, 2],
        )

    def start_all(block_idx, into_slot):
        for c in dmas(block_idx, into_slot):
            c.start()
        @pl.when(block_idx > 0)
        def _():
            pre_dma(block_idx, into_slot).start()
        @pl.when(block_idx + 1 < n_blocks)
        def _():
            post_dma(block_idx, into_slot).start()

    @pl.when(i == 0)
    def _():
        # fire the halo exchange first so it overlaps the interior sweep
        send_to_right().start()
        send_to_left().start()
        start_all(0, 0)

    @pl.when(i + 1 < n_blocks)
    def _():
        start_all(i + 1, nxt_slot)

    for c in dmas(i, slot):
        c.wait()
    @pl.when(i > 0)
    def _():
        pre_dma(i, slot).wait()
    @pl.when(i + 1 < n_blocks)
    def _():
        post_dma(i, slot).wait()

    # halo waits only where needed: block 0 needs the pre halo, the last
    # block needs the post halo (send completion is implied by .wait()).
    @pl.when(i == 0)
    def _():
        send_to_right().wait()
        scratch[slot, 0:W, :] = halo_pre[:]
    @pl.when(i + 1 == n_blocks)
    def _():
        send_to_left().wait()
        scratch[slot, W + B : W + B + W, :] = halo_post[:]

    x_win = scratch[slot]
    acc = jnp.zeros((B, F), jnp.float32)
    for k, o in enumerate(offsets):
        acc = acc + w_ref[:, k : k + 1] * x_win[W + o : W + o + B, :]
    out_ref[:] = acc


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
    if n_local % block:
        raise ValueError(f"n_shard={n_local} must be a multiple of {block}")
    if W > block:
        raise ValueError(f"bandwidth {W} must be <= block={block}")
    # Single-device mesh: loopback RDMA faults the real TPU runtime (the
    # interpret simulator accepts it); the wrap semantics are exactly the
    # circulant kernel, so use it directly.
    if int(jax.lax.axis_size(axis_name)) == 1:
        from gcn_maxcut_tpu.ops.pallas_banded import _banded_spmm_raw

        return _banded_spmm_raw(x, w, offsets, block)
    if F % 128 and not _interpreting():
        # Mosaic DMA slices need 128-aligned lanes on real hardware (the
        # k=3 class dim would fail to compile on a real slice).  Zero-pad
        # the feature dim — exact, if bandwidth-wasteful; an interleaved
        # packed variant (see ops/pallas_banded.banded_spmm_unit_packed)
        # is the full-bandwidth follow-up.
        pad = 128 - F % 128
        xp = jnp.pad(x, ((0, 0), (0, pad)))
        return halo_banded_spmm(
            xp, w, offsets, axis_name, block, collective_id
        )[:, :F]
    n_blocks = n_local // block

    kernel = functools.partial(
        _halo_kernel, tuple(offsets), block, W, F, n_blocks, axis_name
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_local, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * W, F), jnp.float32),   # window
            pltpu.VMEM((W, F), jnp.float32),                  # halo_pre
            pltpu.VMEM((W, F), jnp.float32),                  # halo_post
            pltpu.SemaphoreType.DMA((2, 3)),                  # local window
            pltpu.SemaphoreType.DMA((2,)),                    # send sems
            pltpu.SemaphoreType.DMA((2,)),                    # recv sems
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            **({"collective_id": collective_id} if collective_id is not None else {}),
        ),
    )(w, x)


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
