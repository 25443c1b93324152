"""Pallas-RDMA ring flash attention (forward): KV blocks rotate between
chips via in-kernel async remote DMA, double-buffered so the ICI transfer
of step i+1 overlaps the flash compute of step i.

This is the kernel-level version of ops/sp.py::ring_attention (which rotates
KV with lax.ppermute and lets XLA schedule the overlap — reference ring SP:
models/mmdit/distributed.py:219-422, RingComm double-buffered send/recv on a
second CUDA stream). Here the overlap is explicit: the pallas guide's ring
pattern (make_async_remote_copy + parity-indexed DMA semaphores + a
neighbor barrier).

Status: forward + backward (custom vjp), parity-tested in interpret mode on
a virtual mesh (tests/test_ring_flash.py). The backward mirrors
ops/sp.py::_ring_bwd (reference distributed.py:316-373): dk/dv accumulators
rotate WITH the KV shards in a second f32 comm buffer and land home after a
full circle; dq accumulates locally from the stored global LSE.

Layout: per device q, k, v are (B, H, L_loc, D); output (B, H, L_loc, D)
plus per-row LSE. Grid is (B, H); each cell runs the full sp-step ring for
its (batch, head) slice.

Slot-reuse safety (hardware): the 2-slot parity buffers are protected by a
per-step CONSUMPTION handshake — after a device's reads of slot j are done
and its send from j has drained, it signals its left neighbor's ack[j];
the neighbor waits on that ack before firing a send into slot j. (A DMA
``wait()`` alone covers only the local send-drain and local receive — it
is NOT an ACK, so without the handshake a device running ahead would
overwrite the slot its right neighbor is still computing on.) Across grid
cells, the per-cell neighbor barrier guarantees the right neighbor has
finished the previous cell before the ungated step-0 send fires. Signals
and waits are count-balanced so every semaphore ends at zero. Interpret
mode serializes devices (no race) and skips the handshake with the
barrier. The handshake lowering itself is untestable at sp=1 (this
machine); first multi-chip run should start with the fwd parity check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def flat_neighbor_id(axis: str, shift: int, mesh_axes):
    """Row-major flattened LOGICAL device id of the ring neighbor.

    LOGICAL device ids are flattened mesh coordinates, so the ring neighbor
    must keep every non-``axis`` coordinate (same data/tp group) and shift
    only the ``axis`` coordinate. Using the bare sp index would address the
    wrong device whenever another mesh axis is nontrivial.
    ``mesh_axes`` is ``tuple(zip(mesh.axis_names, mesh.devices.shape))``.
    Traceable under shard_map / pallas (uses lax.axis_index).
    """
    idx = jnp.int32(0)
    for name, size in mesh_axes:
        c = lax.axis_index(name)
        if name == axis:
            c = lax.rem(c + shift + size, size)
        idx = idx * size + c
    return idx


def _ring_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    kv_buf, m_scr, l_scr, acc_scr, sem_send, sem_recv, sem_ack,
    *, axis: str, sp: int, block_q: int, block_k: int, causal_block,
    use_barrier: bool, mesh_axes,
):
    """One (b, h) cell: flash attention over sp ring hops of the KV shard."""
    my_id = lax.axis_index(axis)
    q = q_ref[0, 0]  # (Lq, D)
    l_q, d = q.shape
    l_k = k_ref.shape[2]
    n_q = l_q // block_q
    n_k = l_k // block_k

    # stage the local KV shard into slot 0 of the comm buffer
    kv_buf[0, 0] = k_ref[0, 0]
    kv_buf[0, 1] = v_ref[0, 0]

    right = flat_neighbor_id(axis, 1, mesh_axes)
    left = flat_neighbor_id(axis, -1, mesh_axes)
    if use_barrier:
        # neighbours ready before any RDMA lands (guide: local barrier);
        # get_barrier_semaphore is unsupported by interpret mode, where the
        # recv-semaphore waits alone give a correct (serialized) schedule
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    m_scr[...] = jnp.full_like(m_scr, NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    for step in range(sp):
        cur = step % 2
        nxt = (step + 1) % 2
        if step + 1 < sp:
            if use_barrier and step >= 1:
                # consumption handshake: slot ``nxt`` of the RIGHT neighbor
                # was its compute slot at step-1 — without this wait a
                # device running ahead would overwrite the slot its right
                # neighbor is still reading (rdma.wait only covers our own
                # send-drain + our own recv, it is NOT an ACK). Interpret
                # mode serializes devices, so the race cannot occur there
                # and the handshake is skipped with the barrier.
                pltpu.semaphore_wait(sem_ack.at[nxt], 1)
            # kick off the transfer of the CURRENT slot to the right
            # neighbour's NEXT slot while we compute on it
            rdma = pltpu.make_async_remote_copy(
                src_ref=kv_buf.at[cur],
                dst_ref=kv_buf.at[nxt],
                send_sem=sem_send.at[cur],
                recv_sem=sem_recv.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()

        k_step = kv_buf[cur, 0]
        v_step = kv_buf[cur, 1]
        # the shard held at `step` originated on device (my_id - step)
        src = lax.rem(my_id + sp - step, sp)
        k_off = src * l_k

        sm_scale = 1.0 / (d ** 0.5)
        for qi in range(n_q):
            sl = slice(qi * block_q, (qi + 1) * block_q)
            qb = q[sl].astype(jnp.float32)
            mb = m_scr[sl]
            lb = l_scr[sl]
            ab = acc_scr[sl]
            for ki in range(n_k):
                kb = k_step[ki * block_k:(ki + 1) * block_k].astype(jnp.float32)
                vb = v_step[ki * block_k:(ki + 1) * block_k].astype(jnp.float32)
                s = (qb @ kb.T) * sm_scale
                if causal_block is not None:
                    row = (my_id * l_q + qi * block_q
                           + lax.broadcasted_iota(jnp.int32, s.shape, 0))
                    col = (k_off + ki * block_k
                           + lax.broadcasted_iota(jnp.int32, s.shape, 1))
                    s = jnp.where(
                        col // causal_block <= row // causal_block, s, NEG_INF
                    )
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(mb, m_cur)
                m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
                p = jnp.exp(s - m_safe)
                corr = jnp.exp(mb - m_safe)
                lb = lb * corr + jnp.sum(p, axis=-1, keepdims=True)
                ab = ab * corr + p @ vb
                mb = m_new
            m_scr[sl] = mb
            l_scr[sl] = lb
            acc_scr[sl] = ab

        if step + 1 < sp:
            rdma.wait()  # next slot received; our send drained
            if use_barrier and step + 2 < sp:
                # our send from ``cur`` has drained and our reads of it are
                # done — tell the LEFT neighbor it may overwrite our ``cur``
                # slot on its next send. Signals: steps 0..sp-3; consumed by
                # the neighbor's waits at steps 1..sp-2 (the last step sends
                # nothing) — balanced, the semaphore ends at zero.
                pltpu.semaphore_signal(
                    sem_ack.at[cur], inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

    l_safe = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
    o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = (m_scr[...] + jnp.log(l_safe)).astype(jnp.float32)


def _ring_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    kv_buf, grad_buf, dq_scr, kv_send, kv_recv, gr_send, gr_recv, sem_ack,
    *, axis: str, sp: int, block_q: int, block_k: int, causal_block,
    use_barrier: bool, mesh_axes,
):
    """Backward ring (mirrors ops/sp.py::_ring_bwd / reference
    opensora/models/mmdit/distributed.py:316-373): the KV shards rotate as
    in the forward while their dk/dv accumulators travel WITH them in a
    second f32 comm buffer — after sp hops each accumulator is home on the
    shard's owner. dq accumulates locally from the stored global LSE."""
    my_id = lax.axis_index(axis)
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    l_q, d = q.shape
    l_k = k_ref.shape[2]
    n_q = l_q // block_q
    n_k = l_k // block_k

    kv_buf[0, 0] = k_ref[0, 0]
    kv_buf[0, 1] = v_ref[0, 0]
    grad_buf[0, :] = jnp.zeros_like(grad_buf[0])

    right = flat_neighbor_id(axis, 1, mesh_axes)
    left = flat_neighbor_id(axis, -1, mesh_axes)
    if use_barrier:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    dq_scr[...] = jnp.zeros_like(dq_scr)
    sm_scale = 1.0 / (d ** 0.5)

    for step in range(sp):
        cur = step % 2
        nxt = (step + 1) % 2
        if use_barrier and step >= 1:
            # consumption handshake (see _ring_fwd_kernel): the right
            # neighbor must have fully finished step-1 (its ack covers its
            # kv slot reuse AND its grad-slot send drain) before we fire
            # ANY of this step's transfers at it — including the final
            # step's grad hop, which writes the neighbor's ``nxt`` grad
            # slot. Waits: steps 1..sp-1; signals: steps 0..sp-2 — balanced.
            pltpu.semaphore_wait(sem_ack.at[nxt], 1)
        if step + 1 < sp:
            # KV is read-only: its transfer overlaps this step's compute
            kv_rdma = pltpu.make_async_remote_copy(
                src_ref=kv_buf.at[cur], dst_ref=kv_buf.at[nxt],
                send_sem=kv_send.at[cur], recv_sem=kv_recv.at[nxt],
                device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            kv_rdma.start()

        k_step = kv_buf[cur, 0]
        v_step = kv_buf[cur, 1]
        src = lax.rem(my_id + sp - step, sp)
        k_off = src * l_k

        for ki in range(n_k):
            ks = slice(ki * block_k, (ki + 1) * block_k)
            kb = k_step[ks].astype(jnp.float32)
            vb = v_step[ks].astype(jnp.float32)
            dk_b = jnp.zeros((block_k, d), jnp.float32)
            dv_b = jnp.zeros((block_k, d), jnp.float32)
            for qi in range(n_q):
                qs = slice(qi * block_q, (qi + 1) * block_q)
                qb = q[qs].astype(jnp.float32)
                dob = do[qs].astype(jnp.float32)
                lse_b = lse_ref[0, 0][qs]      # (bq, 1)
                delta_b = delta_ref[0, 0][qs]  # (bq, 1)
                s = (qb @ kb.T) * sm_scale
                if causal_block is not None:
                    row = (my_id * l_q + qi * block_q
                           + lax.broadcasted_iota(jnp.int32, s.shape, 0))
                    col = (k_off + ki * block_k
                           + lax.broadcasted_iota(jnp.int32, s.shape, 1))
                    s = jnp.where(
                        col // causal_block <= row // causal_block, s, NEG_INF
                    )
                p = jnp.exp(s - lse_b)  # masked scores underflow to 0
                dv_b = dv_b + p.T @ dob
                dp = dob @ vb.T
                ds = p * (dp - delta_b) * sm_scale
                dq_scr[qs] += ds @ kb
                dk_b = dk_b + ds.T @ qb
            grad_buf[cur, 0, ks] += dk_b
            grad_buf[cur, 1, ks] += dv_b

        # grads hop on EVERY step (sp hops total → accumulator lands home);
        # must go after the local contribution is added
        gr_rdma = pltpu.make_async_remote_copy(
            src_ref=grad_buf.at[cur], dst_ref=grad_buf.at[nxt],
            send_sem=gr_send.at[cur], recv_sem=gr_recv.at[nxt],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        gr_rdma.start()
        if step + 1 < sp:
            kv_rdma.wait()
        gr_rdma.wait()
        if use_barrier and step + 1 < sp:
            # all of this step's sends drained + reads done → left neighbor
            # may overwrite our ``cur`` slots next step
            pltpu.semaphore_signal(
                sem_ack.at[cur], inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

    home = sp % 2
    dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)
    dk_ref[0, 0] = grad_buf[home, 0].astype(dk_ref.dtype)
    dv_ref[0, 0] = grad_buf[home, 1].astype(dv_ref.dtype)


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "sp",
    block_q: int = 256,
    block_k: int = 256,
    causal_block=None,
    interpret: bool = False,
):
    """Sequence-parallel flash attention with in-kernel RDMA KV rotation.

    q, k, v: (B, H, L_global, D) logically; sharded over ``axis`` on L.
    Returns (out, lse) with the same sharding. Differentiable: the backward
    runs the RDMA ring in reverse-accumulation form (_ring_bwd_kernel).
    """
    sp = mesh.shape[axis]
    mesh_axes = tuple(zip(mesh.axis_names, mesh.devices.shape))

    def _fwd_pallas(q_l, k_l, v_l):
        b, h, l_q, d = q_l.shape
        l_k = k_l.shape[2]
        bq = min(block_q, l_q)
        bk = min(block_k, l_k)
        assert l_q % bq == 0 and l_k % bk == 0, "local lengths must tile evenly"
        kern = functools.partial(
            _ring_fwd_kernel, axis=axis, sp=sp,
            block_q=bq, block_k=bk, causal_block=causal_block,
            use_barrier=not interpret, mesh_axes=mesh_axes,
        )
        return pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, l_q, d), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, l_k, d), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, l_k, d), lambda i, j: (i, j, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, l_q, d), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, l_q, 1), lambda i, j: (i, j, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, l_q, d), q_l.dtype),
                jax.ShapeDtypeStruct((b, h, l_q, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2, l_k, d), k_l.dtype),  # [slot, k/v, L, D]
                pltpu.VMEM((l_q, 1), jnp.float32),      # running max
                pltpu.VMEM((l_q, 1), jnp.float32),      # running sum
                pltpu.VMEM((l_q, d), jnp.float32),      # accumulator
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR((2,)),  # per-slot consumption ACK
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7,
                # whole-shard windows exceed the 16M default scoped-VMEM cap
                # well before the chip's physical VMEM; lift it (v5e: 128M)
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q_l, k_l, v_l)

    def _bwd_pallas(q_l, k_l, v_l, o_l, lse_l, do_l):
        b, h, l_q, d = q_l.shape
        l_k = k_l.shape[2]
        bq = min(block_q, l_q)
        bk = min(block_k, l_k)
        delta = jnp.sum(
            do_l.astype(jnp.float32) * o_l.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        kern = functools.partial(
            _ring_bwd_kernel, axis=axis, sp=sp,
            block_q=bq, block_k=bk, causal_block=causal_block,
            use_barrier=not interpret, mesh_axes=mesh_axes,
        )
        q_spec = pl.BlockSpec((1, 1, l_q, d), lambda i, j: (i, j, 0, 0))
        k_spec = pl.BlockSpec((1, 1, l_k, d), lambda i, j: (i, j, 0, 0))
        r_spec = pl.BlockSpec((1, 1, l_q, 1), lambda i, j: (i, j, 0, 0))
        return pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec],
            out_specs=[q_spec, k_spec, k_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, l_q, d), q_l.dtype),
                jax.ShapeDtypeStruct((b, h, l_k, d), k_l.dtype),
                jax.ShapeDtypeStruct((b, h, l_k, d), v_l.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2, l_k, d), k_l.dtype),   # rotating KV
                pltpu.VMEM((2, 2, l_k, d), jnp.float32),  # rotating dk/dv
                pltpu.VMEM((l_q, d), jnp.float32),        # local dq
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR((2,)),  # per-slot consumption ACK
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=8,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q_l, k_l, v_l, do_l, lse_l, delta)

    @jax.custom_vjp
    def _ring(q_l, k_l, v_l):
        return _fwd_pallas(q_l, k_l, v_l)

    def _ring_f(q_l, k_l, v_l):
        out, lse = _fwd_pallas(q_l, k_l, v_l)
        return (out, lse), (q_l, k_l, v_l, out, lse)

    def _ring_b(res, cts):
        q_l, k_l, v_l, out, lse = res
        do, _ = cts  # lse cotangent unused (stat output)
        dq, dk, dv = _bwd_pallas(q_l, k_l, v_l, out, lse, do.astype(q_l.dtype))
        return dq, dk, dv

    _ring.defvjp(_ring_f, _ring_b)

    return shard_map(
        _ring,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=(P(None, None, axis, None), P(None, None, axis, None)),
        check_vma=False,
    )(q, k, v)
