"""Pallas TPU ring all-gather SpMM — STRUCTURAL comm/compute overlap.

The XLA formulation (``parallel/spgemm.py::overlapped_gather_spgemm``) leaves
comm/compute overlap to XLA's latency-hiding scheduler; the AOT-compiled HLO
evidences the schedule (``tools/overlap_evidence.py``). This kernel makes the
overlap *structural*: at every ring step each chip STARTS the RDMA of its
resident activation chunk to the right neighbor
(``pltpu.make_async_remote_copy``) and then runs the local SpMM on that same
chunk while the transfer is in flight. Flow control is explicit:

* double-buffered chunk storage (``buf[2, mc, K]``) — the transfer of step t
  lands in the slot the compute of step t is *not* reading;
* a consumed-slot ACK semaphore back to the left neighbor, so a sender can
  never overwrite a slot its receiver is still reading (the recv-semaphore
  alone only orders a chip against its *left* neighbor; around a d-ring the
  lag can reach d-1 steps, so a 2-slot buffer needs the explicit ack);
* a neighbor barrier before the first RDMA (buffers must exist everywhere).

Reference: net-new (SURVEY.md §2.3 — the reference is single-node CPU);
the schedule is the collective-matmul recipe from the scaling-book.
Weights ride as a column-sharded dense int8 ternary plane (DenseTernary);
the dot is exact (``Precision.HIGHEST``).

Runs on a real multi-chip TPU slice; on the CPU test mesh it executes under
Pallas TPU *interpret* mode (``pltpu.InterpretParams``), which emulates
remote DMAs and semaphores per device (tests/test_ring_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ternary_spgemm_tpu.formats import DenseTernary


def _ring_kernel(me_ref, x_ref, w_ref, b_ref, o_ref, buf, send_sem, recv_sem,
                 ack0, ack1, *, d: int, mc: int):
    logical = pltpu.DeviceIdType.LOGICAL
    me = me_ref[0, 0]
    right = jax.lax.rem(me + 1, d)
    left = jax.lax.rem(me + d - 1, d)

    buf[0] = x_ref[:]

    # Neighbor barrier: nobody RDMAs until both neighbors entered the kernel.
    bar = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(bar, inc=1, device_id=left, device_id_type=logical)
    pltpu.semaphore_signal(bar, inc=1, device_id=right, device_id_type=logical)
    pltpu.semaphore_wait(bar, 2)

    w = w_ref[:].astype(jnp.float32)
    acks = (ack0, ack1)
    for t in range(d):                      # d is static: fully unrolled
        slot = t % 2
        rdma = None
        if t < d - 1:
            if t >= 1:
                # right neighbor must have consumed the slot we are about to
                # overwrite (its compute of step t-1)
                pltpu.semaphore_wait(acks[(t - 1) % 2], 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=buf.at[slot],
                dst_ref=buf.at[(t + 1) % 2],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[(t + 1) % 2],
                device_id=right,
                device_id_type=logical,
            )
            rdma.start()                    # <-- overlaps the dot below

        owner = jax.lax.rem(me - t + d, d)  # whose rows we currently hold
        y = jnp.dot(buf[slot], w, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) + b_ref[:]
        o_ref[pl.ds(pl.multiple_of(owner * mc, mc), mc), :] = y

        if 0 < d - 2 and t <= d - 3:
            # ack our consumption of buf[slot] to the LEFT neighbor (who
            # writes our slots); only the acks somebody waits for are sent,
            # so every semaphore drains to zero by kernel end
            pltpu.semaphore_signal(acks[slot], inc=1, device_id=left,
                                   device_id_type=logical)
        if rdma is not None:
            rdma.wait()


def ring_allgather_spgemm(X, fmt: DenseTernary, bias, *, mesh: Mesh,
                          axis: str, collective_id: int = 7,
                          interpret=None):
    """Y = X @ W + b with X row(M)-sharded and W/bias column-sharded along
    ``axis``; returns Y sharded (None, axis). One pallas_call per chip runs
    the whole ring. M must be divisible by the axis size (pad upstream);
    the per-chip chunk rows must be a multiple of 8 (f32 sublane tile)."""
    d = mesh.shape[axis]
    M = X.shape[0]
    if M % d:
        raise ValueError(f"M={M} not divisible by ring size {d}")
    mc = M // d
    if mc % 8:
        raise ValueError(f"chunk rows {mc} not a multiple of 8 (pad M)")
    W = jnp.asarray(fmt.dense)
    b = jnp.asarray(bias, jnp.float32)

    def local(x_chunk, w_local, b_local):
        me = jax.lax.axis_index(axis).astype(jnp.int32).reshape(1, 1)
        NL = w_local.shape[1]
        K = x_chunk.shape[1]
        return pl.pallas_call(
            functools.partial(_ring_kernel, d=d, mc=mc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, NL), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, mc, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR,
                pltpu.SemaphoreType.REGULAR,
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=collective_id, has_side_effects=True),
            interpret=interpret if interpret is not None else False,
        )(me, x_chunk, w_local, b_local.reshape(1, -1))

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(axis)),
        out_specs=P(None, axis), check_vma=False,
    )(X, W, b)
