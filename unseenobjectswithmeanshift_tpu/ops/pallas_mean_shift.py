"""VMEM-resident vMF mean-shift seeding + hill climbing - one Pallas kernel.

The XLA formulation of the reference's clustering (ops/mean_shift.py; ref:
lib/utils/mean_shift.py:79-229) is HBM-bound, not compute-bound: farthest-point
seeding is 100 SEQUENTIAL matvec passes over the [N, 64] embedding matrix
(78.6 MB fp32 at 480x640 - ~8 GB of HBM reads per image), and hill climbing
re-streams it 20 more times while round-tripping the [S, N] kernel weights
through HBM every iteration. At these shapes the whole matrix FITS IN VMEM
(v5e: 128 MB), so this kernel DMAs X^T in ONCE per image and runs both
sequential phases entirely out of VMEM:

  grid = (B, S + max_iters), X^T resident per image:
    step 0..S-1      farthest-point seeding: argmax of the running min
                     distance, one-hot MXU gather of the seed row, one
                     [1,64]x[64,N] matvec, running min update
                     (ref: select_smart_seeds, mean_shift.py:128-189)
    step S..S+I-1    hill climbing: W = exp(kappa Z X^T) chunk-wise,
                     Z <- normalize(W X) - the [S, N] weights never exist,
                     each chunk is two MXU dots fused with the exp
                     (ref: seed_hill_climbing_ball, mean_shift.py:79-109)

All arithmetic is fp32 and matches ops/mean_shift.py op for op (same argmax
tie-breaking, same normalize epsilon), so seed selection - which feeds a
discrete argmax - agrees with the XLA path. Pixel assignment (one streamed
pass), connected components over the 100 seeds and the relabeling stay in XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(first_ref, xt_hbm, seeds_ref, idx_ref,
            xt, dist, seeds, dma_sem,
            *, kappa: float, N: int, Np: int, S: int, Sp: int,
            max_iters: int, chunk: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _load():
        # X^T for this image, HBM -> VMEM, exactly once per image
        copy = pltpu.make_async_copy(xt_hbm.at[b], xt, dma_sem)
        copy.start()
        copy.wait()

    def gather_matvec(idx):
        """seed = X[idx] via one-hot MXU gather; dnew = 0.5(1 - X @ seed).

        Padded columns duplicate column 0, so a padded lane can only TIE a
        real max and jnp.argmax resolves ties to the first (= real) index.
        """
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        onehot = (lane == idx).astype(f32)                       # [1, Np]
        seed = jax.lax.dot_general(onehot, xt[:],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)   # [1, d]
        dnew = jax.lax.dot_general(seed, xt[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)   # [1, Np]
        return seed, 0.5 * (1.0 - dnew)

    @pl.when(i == 0)
    def _first_seed():
        if Sp != S:
            # hygiene: the padded seed rows S..Sp-1 are emitted and run
            # through exp() in hill climbing; zero them so uninitialized
            # VMEM can't surface inf/NaN in the (host-sliced-off) padding
            seeds[:] = jnp.zeros_like(seeds[:])
        idx0 = first_ref[b]
        seed, d0 = gather_matvec(idx0)
        dist[:] = d0
        seeds[0:1, :] = seed
        idx_ref[0, 0, 0] = idx0

    @pl.when((i >= 1) & (i < S))
    def _fps_step():
        idx = jnp.argmax(dist[:], axis=1)[0].astype(jnp.int32)
        seed, dnew = gather_matvec(idx)
        dist[:] = jnp.minimum(dist[:], dnew)
        seeds[pl.ds(i, 1), :] = seed
        idx_ref[0, 0, i] = idx

    @pl.when(i >= S)
    def _hill_climb():
        Z = seeds[:]                                             # [Sp, d]
        n_chunks = Np // chunk

        def body(j, acc):
            xc = xt[:, pl.ds(j * chunk, chunk)]                  # [d, ck]
            w = jnp.exp(kappa * jax.lax.dot_general(
                Z, xc, (((1,), (0,)), ((), ())),
                preferred_element_type=f32))                     # [Sp, ck]
            if Np != N:
                # padded columns (duplicates of column 0) must not
                # contribute extra kernel mass
                lane = j * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (1, chunk), 1)
                w = w * (lane < N).astype(f32)
            return acc + jax.lax.dot_general(
                w, xc, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                      # [Sp, d]

        acc = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros_like(seeds[:]))
        nrm = jnp.sqrt(jnp.sum(acc * acc, axis=1, keepdims=True))
        seeds[:] = acc / jnp.maximum(nrm, 1e-12)   # torch F.normalize eps

        @pl.when(i == n_steps - 1)
        def _emit():
            seeds_ref[0] = seeds[:]


@partial(jax.jit, static_argnames=("kappa", "num_seeds", "max_iters", "chunk",
                                   "interpret"))
def mean_shift_seeds_pallas(X, first_seed_idx, kappa: float = 20.0,
                            num_seeds: int = 100, max_iters: int = 10,
                            chunk: int = 4096, interpret: bool = False):
    """Farthest-point seeding + vMF hill climbing, VMEM-resident.

    X: [B, N, d] fp32 unit vectors; first_seed_idx: [B] int32 (the reference
    draws it uniformly; pass your own). Returns (updated_seeds [B, S, d],
    selected_indices [B, S]).
    """
    B, N, d = X.shape
    S = num_seeds
    Sp = _round_up(S, 8)
    Np = _round_up(N, chunk)
    xt = X.astype(jnp.float32).transpose(0, 2, 1)                # [B, d, N]
    if Np != N:
        # pad columns with duplicates of column 0: they can only TIE a real
        # argmax (resolved to the lower, real index) and their hill-climb
        # contribution is masked in-kernel
        xt = jnp.concatenate(
            [xt, jnp.broadcast_to(xt[:, :, :1], (B, d, Np - N))], axis=2)
    first = jnp.broadcast_to(jnp.asarray(first_seed_idx, jnp.int32), (B,))

    grid = (B, S + max_iters)
    seeds_out, idx_out = pl.pallas_call(
        partial(_kernel, kappa=float(kappa), N=N, Np=Np, S=S, Sp=Sp,
                max_iters=max_iters, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B,), lambda b, i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # X^T in HBM; manual DMA
        ],
        out_specs=[
            pl.BlockSpec((1, Sp, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sp, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Sp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, Np), jnp.float32),        # resident X^T
            pltpu.VMEM((1, Np), jnp.float32),        # running min distance
            pltpu.VMEM((Sp, d), jnp.float32),        # seeds / hill-climb state
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(first, xt)
    return seeds_out[:, :S, :], idx_out[:, 0, :S]


def _fps_kernel(first_ref, x_hbm, xt_hbm, seeds_ref, idx_ref,
                xt, dist, seeds, seed_buf, load_sem, row_sem,
                *, N: int, Np: int, S: int, Sp: int):
    """Farthest-point seeding only, X^T resident in VMEM.

    Round-3 redesign of the seeding phase after the full kernel's measured
    rejection: the old per-seed ONE-HOT MXU GATHER re-read the entire [d, Np]
    matrix (and paid a lane-contraction relayout) once per seed on top of the
    distance matvec - twice the traffic of the minimum. Here the seed row is
    fetched by a 256-byte dynamic-slice DMA from the row-major HBM copy, so
    each of the S sequential steps touches X^T exactly once (the unavoidable
    distance matvec) plus O(Np) distance updates.
    """
    b = pl.program_id(0)
    f32 = jnp.float32
    d = xt.shape[0]

    copy = pltpu.make_async_copy(xt_hbm.at[b], xt, load_sem)
    copy.start()
    copy.wait()

    def fetch_row(idx):
        # rows in x_hbm are padded to a 128-lane multiple (Mosaic requires
        # DMA slices 128-aligned on the minor dim); slice the value back
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx, 1), :], seed_buf,
                                   row_sem)
        cp.start()
        cp.wait()
        return seed_buf[:, 0:d]

    def dist_to(seed):
        dnew = jax.lax.dot_general(seed, xt[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)    # [1, Np]
        return 0.5 * (1.0 - dnew)

    idx0 = first_ref[b]
    seed0 = fetch_row(idx0)
    d0 = dist_to(seed0)
    if Np != N:
        # park padded lanes at -1: real cosine distances live in [0, 1], so
        # they never win the argmax, and min-updates keep them at -1
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        d0 = jnp.where(lane < N, d0, -1.0)
    dist[:] = d0
    seeds[0:1, :] = seed0
    idx_ref[0, 0, 0] = idx0

    def body(i, carry):
        idx = jnp.argmax(dist[:], axis=1)[0].astype(jnp.int32)
        seed = fetch_row(idx)
        dist[:] = jnp.minimum(dist[:], dist_to(seed))
        seeds[pl.ds(i, 1), :] = seed
        idx_ref[0, 0, i] = idx
        return carry

    jax.lax.fori_loop(1, S, body, 0)
    seeds_ref[0] = seeds[:]


@partial(jax.jit, static_argnames=("num_seeds", "interpret"))
def fps_seeds_pallas(X, first_seed_idx, num_seeds: int = 100,
                     interpret: bool = False):
    """Farthest-point seed selection (select_smart_seeds semantics), one
    VMEM-resident Pallas program per image.

    X: [B, N, d] fp32 unit vectors. Returns (seeds [B, S, d],
    selected_indices [B, S]) matching ops/mean_shift.select_smart_seeds
    (ref: lib/utils/mean_shift.py:128-189). Hill climbing / connected
    components / assignment stay in XLA - they measured cheap
    (scripts/profile_ucn_breakdown.py), seeding was ~2/3 of the whole
    UCN pipeline.
    """
    B, N, d = X.shape
    S = num_seeds
    Sp = _round_up(S, 8)
    Np = _round_up(N, 512)
    dp = _round_up(d, 128)   # DMA slices must be 128-aligned on the minor dim
    x = X.astype(jnp.float32)
    xt = x.transpose(0, 2, 1)                                     # [B, d, N]
    if Np != N:
        xt = jnp.concatenate(
            [xt, jnp.zeros((B, d, Np - N), jnp.float32)], axis=2)
    if dp != d:
        x = jnp.concatenate([x, jnp.zeros((B, N, dp - d), jnp.float32)],
                            axis=2)
    first = jnp.broadcast_to(jnp.asarray(first_seed_idx, jnp.int32), (B,))

    seeds_out, idx_out = pl.pallas_call(
        partial(_fps_kernel, N=N, Np=Np, S=S, Sp=Sp),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # X rows in HBM (seed gather)
            pl.BlockSpec(memory_space=pl.ANY),   # X^T in HBM; bulk DMA once
        ],
        out_specs=[
            pl.BlockSpec((1, Sp, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sp), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sp, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Sp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, Np), jnp.float32),        # resident X^T
            pltpu.VMEM((1, Np), jnp.float32),        # running min distance
            pltpu.VMEM((Sp, d), jnp.float32),        # selected seeds
            pltpu.VMEM((1, dp), jnp.float32),        # DMA'd seed row (padded)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(first, x, xt)
    return seeds_out[:, :S, :], idx_out[:, 0, :S]


def mean_shift_smart_init_fps(X, kappa: float = 20.0, num_seeds: int = 100,
                              max_iters: int = 10, epsilon: float = 0.04,
                              first_seed_idx=0, interpret: bool = False):
    """mean_shift_smart_init with ONLY the seeding phase on the Pallas kernel;
    hill climbing / connected components / assignment are the tested XLA ops.
    X: [B, N, d]. Returns (cluster_labels [B, N] int32, indices [B, S])."""
    from .mean_shift import (connected_components, cosine_distance,
                             seed_hill_climbing)

    seeds, indices = fps_seeds_pallas(X, first_seed_idx, num_seeds=num_seeds,
                                      interpret=interpret)
    Xf = X.astype(jnp.float32)
    useeds = jax.vmap(lambda x, z: seed_hill_climbing(x, z, kappa, max_iters))(
        Xf, seeds)
    seed_labels = jax.vmap(lambda z: connected_components(z, epsilon))(useeds)
    closest = jax.vmap(lambda x, z: jnp.argmin(cosine_distance(x, z), axis=1))(
        Xf, useeds)
    cluster_labels = jnp.take_along_axis(seed_labels, closest, axis=1)

    def relabel(lbl):
        counts = jnp.zeros((num_seeds,), jnp.int32).at[lbl].add(1)
        label_max = jnp.argmax(counts).astype(jnp.int32)
        return jnp.where(
            label_max != 0,
            jnp.where(lbl == 0, label_max,
                      jnp.where(lbl == label_max, 0, lbl)),
            lbl)

    return jax.vmap(relabel)(cluster_labels), indices


def mean_shift_smart_init_pallas(X, kappa: float = 20.0, num_seeds: int = 100,
                                 max_iters: int = 10, epsilon: float = 0.04,
                                 first_seed_idx=0, chunk: int = 4096,
                                 interpret: bool = False):
    """Batched mean_shift_smart_init (ops/mean_shift.py semantics) with the
    sequential phases on the Pallas kernel. X: [B, N, d]. Returns
    (cluster_labels [B, N] int32, selected_indices [B, S])."""
    from .mean_shift import connected_components, cosine_distance

    B = X.shape[0]
    seeds, indices = mean_shift_seeds_pallas(
        X, first_seed_idx, kappa=kappa, num_seeds=num_seeds,
        max_iters=max_iters, chunk=chunk, interpret=interpret)
    seed_labels = jax.vmap(lambda z: connected_components(z, epsilon))(seeds)
    # one streamed pass: closest updated seed per pixel (argmin cosine dist)
    closest = jax.vmap(lambda x, z: jnp.argmin(cosine_distance(x, z), axis=1))(
        X.astype(jnp.float32), seeds)
    cluster_labels = jnp.take_along_axis(seed_labels, closest, axis=1)

    def relabel(lbl):
        counts = jnp.zeros((num_seeds,), jnp.int32).at[lbl].add(1)
        label_max = jnp.argmax(counts).astype(jnp.int32)
        return jnp.where(
            label_max != 0,
            jnp.where(lbl == 0, label_max,
                      jnp.where(lbl == label_max, 0, lbl)),
            lbl)

    return jax.vmap(relabel)(cluster_labels), indices
