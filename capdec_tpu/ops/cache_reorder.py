"""Pallas TPU kernel: beam-reorder of the generated KV cache.

`jnp.take(cache, src, axis=1)` — the per-step beam permutation — lowers on
TPU to compare+select chains that read the cache once per beam candidate
(~R+1 full-cache passes; measured 13.1 ms/step of a 19.3 ms beam step at
batch 64). This kernel moves each row exactly once: the *input* BlockSpec's
index map reads row `src[b]` (scalar-prefetched) while the output writes
row `b`, so the permutation happens inside the pipeline's DMAs — the kernel
body is a plain VMEM copy.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(src_ref, k_in, v_in, k_out, v_out):
    k_out[:] = k_in[:]
    v_out[:] = v_in[:]


def _bounded_kernel_factory(E: int, chunk: int):
    n_chunks = -(-E // chunk)

    def kernel(scalars_ref, k_in, v_in, k_out, v_out, sems):
        # scalars: [0] = valid-slot count, [1:] = src row per beam
        b = pl.program_id(0)
        count = scalars_ref[0]
        s = scalars_ref[1 + b]

        def dma(c, size, j):
            src_hbm, dst_hbm = ((k_in, k_out), (v_in, v_out))[j]
            return pltpu.make_async_copy(
                src_hbm.at[:, s, pl.ds(c * chunk, size), :],
                dst_hbm.at[:, b, pl.ds(c * chunk, size), :],
                sems.at[2 * c + j])

        for c in range(n_chunks):
            size = min(chunk, E - c * chunk)

            @pl.when(c * chunk < count)
            def _(c=c, size=size):
                dma(c, size, 0).start()
                dma(c, size, 1).start()

        for c in range(n_chunks):
            size = min(chunk, E - c * chunk)

            @pl.when(c * chunk < count)
            def _(c=c, size=size):
                dma(c, size, 0).wait()
                dma(c, size, 1).wait()

    return kernel, n_chunks


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def reorder_cache_rows_bounded(k: jnp.ndarray, v: jnp.ndarray,
                               src: jnp.ndarray, count: jnp.ndarray,
                               chunk: int = 16,
                               interpret: bool = False
                               ) -> Dict[str, jnp.ndarray]:
    """Gather rows like `reorder_cache_rows`, but move only slot chunks
    below `count` (the number of occupied generated slots) — pure HBM→HBM
    DMAs issued per chunk, skipping unoccupied tail chunks entirely.
    Slots >= count in the output are UNINITIALIZED; decode attention masks
    them NaN-safely (models/gpt2.decode_step)."""
    L, B, E, D = k.shape
    kernel, n_chunks = _bounded_kernel_factory(E, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2 * n_chunks,))],
    )
    scalars = jnp.concatenate(
        [count.reshape(1).astype(jnp.int32), src.astype(jnp.int32)])
    k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars, k, v)
    return {"k": k2, "v": v2}


def _fork_kernel_factory(B: int, wave: int):
    def kernel(src_ref, k_in, v_in, k_out, v_out, sems):
        # In-place (aliased buffers): only rows whose source differs are
        # copied. The lane assignment guarantees a written row is never a
        # source (a lane keeps its own row iff its beam survived there),
        # so conditional copies are hazard-free in any order.
        for w0 in range(0, B, wave):
            n = min(wave, B - w0)
            for j in range(n):
                b = w0 + j
                s = src_ref[b]

                @pl.when(s != b)
                def _(b=b, s=s, j=j):
                    pltpu.make_async_copy(k_in.at[s], k_out.at[b],
                                          sems.at[2 * j]).start()
                    pltpu.make_async_copy(v_in.at[s], v_out.at[b],
                                          sems.at[2 * j + 1]).start()
            for j in range(n):
                b = w0 + j
                s = src_ref[b]

                @pl.when(s != b)
                def _(b=b, s=s, j=j):
                    pltpu.make_async_copy(k_in.at[s], k_out.at[b],
                                          sems.at[2 * j]).wait()
                    pltpu.make_async_copy(v_in.at[s], v_out.at[b],
                                          sems.at[2 * j + 1]).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "wave"))
def copy_forked_rows(k: jnp.ndarray, v: jnp.ndarray, src: jnp.ndarray,
                     wave: int = 64, interpret: bool = False
                     ) -> Dict[str, jnp.ndarray]:
    """In-place row gather for lane-assigned beam search: row b of k/v
    [B, ...] is overwritten with row src[b] ONLY where src[b] != b.

    Beams that survive in their own lane (src[b] == b — the common case;
    stopped beams always) move zero bytes, so per-step traffic is
    proportional to the number of actual beam forks instead of the whole
    cache. Requires the lane-assignment invariant: src[b] != b implies no
    b' reads row b (see decode/beam.py lane assignment)."""
    B = k.shape[0]
    kernel = _fork_kernel_factory(B, wave)
    n_sems = 2 * min(wave, B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_sems,))],
    )
    k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src.astype(jnp.int32), k, v)
    return {"k": k2, "v": v2}


def _fork_bounded_kernel_factory(B: int, E: int, chunk: int, wave: int):
    n_chunks = -(-E // chunk)

    def kernel(scal_ref, k_in, v_in, k_out, v_out, sems):
        # scalars: [0] = valid-slot count, [1:] = src row per lane.
        # Row layout [B, L, E, D]: a chunk slice row.at[:, c*C:(c+1)*C, :]
        # is L strided segments — one DMA descriptor each, still far
        # cheaper than moving the row's unoccupied tail. Only rows whose
        # source differs are copied (lane invariant: a written row is
        # never a source, so in-place conditional copies are hazard-free).
        count = scal_ref[0]
        for w0 in range(0, B, wave):
            n = min(wave, B - w0)
            for phase in range(2):  # 0 = start, 1 = wait
                for j in range(n):
                    b = w0 + j
                    s = scal_ref[1 + b]
                    for c in range(n_chunks):
                        size = min(chunk, E - c * chunk)

                        @pl.when(jnp.logical_and(s != b,
                                                 c * chunk < count))
                        def _(b=b, s=s, j=j, c=c, size=size, phase=phase):
                            for arr_i, (src_hbm, dst_hbm) in enumerate(
                                    ((k_in, k_out), (v_in, v_out))):
                                cp = pltpu.make_async_copy(
                                    src_hbm.at[s, :, pl.ds(c * chunk, size), :],
                                    dst_hbm.at[b, :, pl.ds(c * chunk, size), :],
                                    sems.at[(2 * j + arr_i) * n_chunks + c])
                                if phase == 0:
                                    cp.start()
                                else:
                                    cp.wait()

    return kernel, n_chunks


@functools.partial(jax.jit, static_argnames=("interpret", "wave", "chunk"))
def copy_forked_rows_bounded(k: jnp.ndarray, v: jnp.ndarray,
                             src: jnp.ndarray, count: jnp.ndarray,
                             chunk: int = 24, wave: int = 32,
                             interpret: bool = False
                             ) -> Dict[str, jnp.ndarray]:
    """`copy_forked_rows`, moving only slot chunks below `count` (the
    number of occupied generated slots). With a single full-size cache
    (no staged growth) a whole-row fork copy would move the unwritten
    tail too; here per-fork traffic is proportional to ceil(count/chunk)
    chunks. Slots >= count in forked rows are UNINITIALIZED — decode
    attention masks them (slot < step), matching the bounded reorder's
    contract. k/v: [B, L, E, D] row-major caches (aliased in place)."""
    B, L, E, D = k.shape
    kernel, n_chunks = _fork_bounded_kernel_factory(B, E, chunk, wave)
    n_sems = 2 * min(wave, B) * n_chunks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_sems,))],
    )
    scalars = jnp.concatenate(
        [count.reshape(1).astype(jnp.int32), src.astype(jnp.int32)])
    k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars, k, v)
    return {"k": k2, "v": v2}


def absmax_int8_quant(x: jnp.ndarray):
    """Per-row absmax int8 quantization over the last axis.

    Returns (levels int8, scales f32 with a keepdims last axis);
    value = level * scale. THE quantization used by every int8-KV path —
    the beam Pallas chunk write, the greedy XLA slot write and the test
    oracles must stay in lockstep, so they all call this."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _chunk_write_kernel(scal_ref, k_in, v_in, nk_in, nv_in, k_out, v_out):
    # Blocks are the C-slot chunk containing `step` (aligned: chunk index
    # rides the index map, so the block offset is a multiple of C). Only
    # the slot `step % C` changes; the other C-1 slots pass through.
    C = k_in.shape[2]
    wi = scal_ref[0] % C
    sel = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, C, 1), 2) == wi
    k_out[:] = jnp.where(sel, nk_in[:], k_in[:])
    v_out[:] = jnp.where(sel, nv_in[:], v_in[:])


def _write_chunk_impl(k, v, new_k4, new_v4, step, row_axis: int,
                      block_rows: int, chunk: int, interpret: bool,
                      scales=None):
    """Shared chunk-write pallas_call for both cache layouts and both
    cache dtypes.

    row_axis 0: row-major [B, L, E, D]; row_axis 1: seq-major
    [L, B, E, D]. The slot dim is always axis 2, so the kernel bodies are
    layout-agnostic; only the BlockSpecs differ. new_k4/new_v4 match the
    cache rank with a size-1 slot dim. `scales` = (ks, vs) f32
    [B|L, L|B, 1, E] selects the int8-quantizing kernel (the new slot is
    quantized in-kernel; scales are written alongside)."""
    C = chunk
    B = k.shape[row_axis]
    L = k.shape[1 - row_axis]
    E, D = k.shape[2], k.shape[3]
    if C % 8 or E % C:
        raise ValueError(f"chunk ({C}) must be a multiple of 8 and "
                         f"divide E ({E})")
    if not block_rows:
        # 4 chunk buffers (k/v in/out) double-buffered must fit a ~10 MB
        # VMEM budget (16 MB total on v5e); the int8 variant's scale and
        # new-slot blocks are small against the chunk blocks.
        budget = 10 * 2 ** 20
        block_rows = max(1, budget // (8 * L * C * D * k.dtype.itemsize))
    TB = min(block_rows, B)
    while B % TB:
        TB -= 1
    grid = (B // TB,)
    if row_axis == 0:
        chunk_block, new_block = (TB, L, C, D), (TB, L, 1, D)
        scale_block = (TB, L, 1, E)
        chunk_idx = lambda i, s, C=C: (i, 0, s[0] // C, 0)
        new_idx = lambda i, s: (i, 0, 0, 0)
    else:
        chunk_block, new_block = (L, TB, C, D), (L, TB, 1, D)
        scale_block = (L, TB, 1, E)
        chunk_idx = lambda i, s, C=C: (0, i, s[0] // C, 0)
        new_idx = lambda i, s: (0, i, 0, 0)
    chunk_spec = pl.BlockSpec(chunk_block, chunk_idx)
    new_spec = pl.BlockSpec(new_block, new_idx)
    step_arr = step.reshape(1).astype(jnp.int32)
    if scales is None:
        k2, v2 = pl.pallas_call(
            _chunk_write_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[chunk_spec, chunk_spec, new_spec, new_spec],
                out_specs=[chunk_spec, chunk_spec],
            ),
            out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                       jax.ShapeDtypeStruct(v.shape, v.dtype)],
            input_output_aliases={1: 0, 2: 1},
            interpret=interpret,
        )(step_arr, k, v, new_k4.astype(k.dtype), new_v4.astype(v.dtype))
        return {"k": k2, "v": v2}
    ks, vs = scales
    scale_spec = pl.BlockSpec(scale_block, new_idx)
    k2, v2, ks2, vs2 = pl.pallas_call(
        _chunk_write_q_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[chunk_spec, chunk_spec, scale_spec, scale_spec,
                      new_spec, new_spec],
            out_specs=[chunk_spec, chunk_spec, scale_spec, scale_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(ks.shape, ks.dtype),
                   jax.ShapeDtypeStruct(vs.shape, vs.dtype)],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        interpret=interpret,
    )(step_arr, k, v, ks, vs, new_k4, new_v4)
    return {"k": k2, "v": v2, "ks": ks2, "vs": vs2}


@functools.partial(jax.jit, static_argnames=("block_rows", "chunk",
                                             "interpret"))
def write_gen_slot_chunk(k: jnp.ndarray, v: jnp.ndarray,
                         new_k: jnp.ndarray, new_v: jnp.ndarray,
                         step: jnp.ndarray, block_rows: int = 0,
                         chunk: int = 8,
                         interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Write the new K/V slot `step` into the row-major [B, L, E, D] caches
    in place, streaming ONLY the aligned `chunk`-slot chunk containing
    `step`.

    XLA's dynamic_update_slice at a dynamic index in the tiled slot dim
    lowers to a masked RMW over the ENTIRE cache (~2 ms/step at batch 640,
    E=80). Here the grid's chunk blocks (TB, L, C, D) are the only bytes
    that move: C/E of the cache per write. `chunk` must divide E and be a
    multiple of 8 (Mosaic's pipelined sublane-block granularity; beam.py
    aligns the staged buckets accordingly).

    k/v: [B, L, E, D] (donated, returned updated); new_k/new_v: [B, L, D];
    step: int32 scalar array."""
    return _write_chunk_impl(k, v, new_k[:, :, None, :],
                             new_v[:, :, None, :], step, 0, block_rows,
                             chunk, interpret)


@functools.partial(jax.jit, static_argnames=("block_rows", "chunk",
                                             "interpret"))
def write_gen_slot_chunk_seqmajor(
        k: jnp.ndarray, v: jnp.ndarray, new_k: jnp.ndarray,
        new_v: jnp.ndarray, step: jnp.ndarray, block_rows: int = 0,
        chunk: int = 8, interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """`write_gen_slot_chunk` for the seq-major [L, B, E, D] cache layout
    (greedy/top-p decode, which never reorders rows).

    new_k/new_v: [L, B, D] (the decode scan's stacked per-layer K/V)."""
    return _write_chunk_impl(k, v, new_k[:, :, None, :],
                             new_v[:, :, None, :], step, 1, block_rows,
                             chunk, interpret)


def _chunk_write_q_kernel(scal_ref, k_in, v_in, ks_in, vs_in, nk_in, nv_in,
                          k_out, v_out, ks_out, vs_out):
    # int8 variant: quantize the new slot's K/V (absmax_int8_quant) and
    # insert level + scale into the aliased chunk/scale blocks.
    C = k_in.shape[2]
    E = ks_in.shape[3]
    step = scal_ref[0]
    wi = step % C
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C, 1), 2) == wi
    qk, sk = absmax_int8_quant(nk_in[:])
    qv, sv = absmax_int8_quant(nv_in[:])
    k_out[:] = jnp.where(sel, qk, k_in[:])
    v_out[:] = jnp.where(sel, qv, v_in[:])
    lane_sel = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, E), 3) == step
    ks_out[:] = jnp.where(lane_sel, sk, ks_in[:])
    vs_out[:] = jnp.where(lane_sel, sv, vs_in[:])


@functools.partial(jax.jit, static_argnames=("block_rows", "chunk",
                                             "interpret"))
def write_gen_slot_chunk_q(k: jnp.ndarray, v: jnp.ndarray,
                           ks: jnp.ndarray, vs: jnp.ndarray,
                           new_k: jnp.ndarray, new_v: jnp.ndarray,
                           step: jnp.ndarray, block_rows: int = 0,
                           chunk: int = 8,
                           interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """`write_gen_slot_chunk` for the int8 generated cache: quantizes the
    new slot (absmax_int8_quant -> int8 level + f32 scale) and writes
    level chunk + scale lane in place.

    k/v: int8 [B, L, E, D] (donated); ks/vs: f32 [B, L, 1, E] scales
    (donated); new_k/new_v: [B, L, D] unquantized; step: int32 scalar."""
    return _write_chunk_impl(k, v, new_k[:, :, None, :],
                             new_v[:, :, None, :], step, 0, block_rows,
                             chunk, interpret, scales=(ks, vs))


def _write_slot_kernel(step_ref, kp_in, vp_in, k_in, v_in, k_out, v_out,
                       sems):
    # kp/vp: [B, L, 2, D] — the updated 2-slot pair window starting at the
    # even slot `step & ~1`; k/v: [B, L, E, D] caches aliased in place.
    # The write is one strided DMA per array at a provably 2-aligned slot
    # offset (bf16 tiling is (2, 128) on the (E, D) dims, so a size-2
    # window at an even offset is tile-legal; a single-slot slice is not).
    # XLA's dynamic-update-slice at a dynamic sublane index lowers to a
    # full-cache masked read-modify-write pass instead (measured
    # 2.4 ms/step of a 15.4 ms beam step at batch 640).
    base = pl.multiple_of((step_ref[0] // 2) * 2, 2)
    ck = pltpu.make_async_copy(
        kp_in, k_out.at[:, :, pl.ds(base, 2), :], sems.at[0])
    cv = pltpu.make_async_copy(
        vp_in, v_out.at[:, :, pl.ds(base, 2), :], sems.at[1])
    ck.start()
    cv.start()
    ck.wait()
    cv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_gen_slot(k: jnp.ndarray, v: jnp.ndarray, k_new: jnp.ndarray,
                   v_new: jnp.ndarray, step: jnp.ndarray,
                   interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Write the per-layer new K/V into generated slot `step` of the
    row-major [B, L, E, D] caches, in place (aliased buffers).

    k_new/v_new: [B, L, D]. The kernel DMAs a 2-slot pair window at the
    even offset `step & ~1`: slot `step` gets the new K/V, its pair
    neighbor is rewritten with its current contents (read back first), so
    the result is exactly a single-slot update. E must be even (cache
    allocs round to a multiple of 8)."""
    B, L, E, D = k.shape
    base = (step // 2) * 2
    off = step - base
    sel = (jnp.arange(2) == off)[None, None, :, None]

    def pair(cache, new):
        window = lax.dynamic_slice(cache, (0, 0, base, 0), (B, L, 2, D))
        return jnp.where(sel, new[:, :, None, :].astype(cache.dtype),
                         window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    k2, v2 = pl.pallas_call(
        _write_slot_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(step.reshape(1).astype(jnp.int32),
      pair(k, k_new), pair(v, v_new), k, v)
    return {"k": k2, "v": v2}


def _rowmajor_kernel_factory(B: int, wave: int):
    def kernel(src_ref, k_in, v_in, k_out, v_out, sems):
        for w0 in range(0, B, wave):
            n = min(wave, B - w0)
            for j in range(n):
                b = w0 + j
                s = src_ref[b]
                pltpu.make_async_copy(k_in.at[s], k_out.at[b],
                                      sems.at[2 * j]).start()
                pltpu.make_async_copy(v_in.at[s], v_out.at[b],
                                      sems.at[2 * j + 1]).start()
            for j in range(n):
                b = w0 + j
                s = src_ref[b]
                pltpu.make_async_copy(k_in.at[s], k_out.at[b],
                                      sems.at[2 * j]).wait()
                pltpu.make_async_copy(v_in.at[s], v_out.at[b],
                                      sems.at[2 * j + 1]).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "wave"))
def reorder_rows_leading(k: jnp.ndarray, v: jnp.ndarray,
                         src: jnp.ndarray, wave: int = 64,
                         interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Gather rows of k/v [B, ...] along axis 0 by `src` [B] int32.

    With the row-major cache layout ([B, L, E, D], E a multiple of 8),
    each row is ONE contiguous block, so the gather is one DMA descriptor
    per row per array — the [L, B, E, D] gather needs L strided segments
    per row and is descriptor-issue-bound (measured 260 GB/s)."""
    B = k.shape[0]
    kernel = _rowmajor_kernel_factory(B, wave)
    n_sems = 2 * min(wave, B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_sems,))],
    )
    k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src.astype(jnp.int32), k, v)
    return {"k": k2, "v": v2}


@functools.partial(jax.jit, static_argnames=("interpret", "rows_per_block"))
def reorder_cache_rows(k: jnp.ndarray, v: jnp.ndarray, src: jnp.ndarray,
                       interpret: bool = False,
                       rows_per_block: int = 1) -> Dict[str, jnp.ndarray]:
    """Gather rows of k/v [L, B, E, D] along axis 1 by `src` [B] int32.

    Grid is over beam rows; each program moves the row's slices across all
    L layers in one block ([L, 1, E, D] ≈ 1.2 MB for GPT-2 base), keeping
    DMAs large and program count low.
    """
    L, B, E, D = k.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((L, 1, E, D), lambda b, s: (0, s[b], 0, 0)),
            pl.BlockSpec((L, 1, E, D), lambda b, s: (0, s[b], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((L, 1, E, D), lambda b, s: (0, b, 0, 0)),
            pl.BlockSpec((L, 1, E, D), lambda b, s: (0, b, 0, 0)),
        ],
    )
    k2, v2 = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        interpret=interpret,
    )(src.astype(jnp.int32), k, v)
    return {"k": k2, "v": v2}
