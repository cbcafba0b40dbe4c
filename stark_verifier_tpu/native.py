"""ctypes loader for the native host hash plane (native/svt_poseidon.c).

Builds the shared library on first import if missing/stale (gcc, ~1 s; the
artifact is cached next to the source) and exposes numpy-friendly wrappers.
`lib()` returns None when building fails or SVT_NATIVE=0 — callers fall back
to the pure-numpy path, so the native plane is an accelerator, never a
requirement. Bit-exactness vs the numpy golden model is pinned by
tests/test_native.py."""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent
_SRC = _REPO / "native" / "svt_poseidon.c"
_HDR = _REPO / "native" / "poseidon_constants.h"
_SO = _REPO / "native" / "_svt_poseidon.so"

# libgomp's default active spin-wait keeps worker threads burning cores
# between parallel regions; with the AVX-512 planes, native calls are
# short and frequent, and the spinning starves the interleaved
# single-threaded numpy phases (measured 37.3 s -> 23.9 s on one
# aggregation pair-prove). Must be set before libgomp loads — hoisted to
# module import time so it applies regardless of whether lib() or
# bn254_lib() (or any other OpenMP user) triggers the first load.
os.environ.setdefault("OMP_WAIT_POLICY", "passive")

_lib = None
_tried = False


def _build() -> bool:
    if not _HDR.exists():
        r = subprocess.run(
            ["python", str(_REPO / "tools" / "gen_native_constants.py")],
            capture_output=True)
        if r.returncode != 0:
            return False
    # build to a temp path then rename: a process that already mmapped the
    # old .so keeps its mapping (in-place truncation would SIGBUS it)
    tmp = _SO.with_suffix(".so.tmp")
    cmd = ["gcc", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-o", str(tmp)]
    r = subprocess.run(cmd, capture_output=True)
    if r.returncode != 0:
        # retry without OpenMP (portability fallback)
        cmd = ["gcc", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)]
        r = subprocess.run(cmd, capture_output=True)
    if r.returncode == 0:
        os.replace(tmp, _SO)
    return r.returncode == 0


def lib():
    """The loaded CDLL, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SVT_NATIVE", "1") != "1":
        return None
    try:
        # staleness: the .so embeds the generated constants header too — a
        # regenerated header with an unchanged .c must also trigger a rebuild
        src_mtime = _SRC.stat().st_mtime
        for hdr in (_HDR, _SRC.parent / "gl_avx512.h"):
            if hdr.exists():
                src_mtime = max(src_mtime, hdr.stat().st_mtime)
        if not _SO.exists() or _SO.stat().st_mtime < src_mtime:
            if not _build():
                return None
        L = ctypes.CDLL(str(_SO))
        u64p = ctypes.POINTER(ctypes.c_uint64)
        L.svt_permute_batch.argtypes = [u64p, ctypes.c_int64]
        L.svt_hash_no_pad_batch.argtypes = [
            u64p, ctypes.c_int64, ctypes.c_int64, u64p]
        L.svt_merkle_level.argtypes = [u64p, ctypes.c_int64, u64p]
        L.svt_grind_pow.restype = ctypes.c_uint64
        L.svt_grind_pow.argtypes = [
            u64p, u64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64]
        L.svt_grind_pow_batch.argtypes = [
            u64p, u64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, u64p]
        L.svt_gl_mul.argtypes = [u64p, u64p, u64p, ctypes.c_int64]
        L.svt_gl_mul_add.argtypes = [u64p, u64p, u64p, u64p, ctypes.c_int64]
        if hasattr(L, "svt_gl_add_arr"):
            L.svt_gl_add_arr.argtypes = [u64p, u64p, u64p, ctypes.c_int64]
            L.svt_gl_sub_arr.argtypes = [u64p, u64p, u64p, ctypes.c_int64]
        if hasattr(L, "svt_poseidon_fill_batch"):
            L.svt_poseidon_fill_batch.argtypes = [u64p, ctypes.c_int64]
        if hasattr(L, "svt_poseidon_eval_batch"):
            L.svt_poseidon_eval_batch.argtypes = [u64p, ctypes.c_int64, u64p]
        if hasattr(L, "svt_poseidon_eval_batch_p"):
            L.svt_poseidon_eval_batch_p.argtypes = [
                ctypes.POINTER(u64p), ctypes.c_int64, u64p]
        if hasattr(L, "svt_ext2_arith_batch"):
            L.svt_ext2_arith_batch.argtypes = (
                [ctypes.c_uint64] * 2 + [u64p] * 8 + [ctypes.c_int64])
            L.svt_ext2_reduce_chain.argtypes = (
                [u64p] * 6 + [ctypes.c_int64] * 2)
        if hasattr(L, "svt_ntt_batch"):
            L.svt_ntt_batch.argtypes = [
                u64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64]
            L.svt_coset_lde_batch.argtypes = [
                u64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_uint64, ctypes.c_uint64, u64p]
        _lib = L
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def permute12_np(state: np.ndarray) -> np.ndarray:
    """Poseidon permutation on stacked state uint64[12, ...]."""
    L = lib()
    assert L is not None
    trailing = state.shape[1:]
    # copy=True: svt_permute_batch works in place, and ascontiguousarray
    # would alias the caller's buffer for already-contiguous layouts
    flat = np.array(
        np.moveaxis(state, 0, -1).reshape(-1, 12), dtype=np.uint64,
        copy=True, order="C")
    L.svt_permute_batch(_ptr(flat), flat.shape[0])
    return np.moveaxis(flat.reshape(trailing + (12,)), -1, 0)


def hash_no_pad_np(rows: np.ndarray) -> np.ndarray:
    """plonky2 hash_n_to_m_no_pad (m=4): uint64[n, w] -> uint64[n, 4]."""
    L = lib()
    assert L is not None
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    n, w = rows.shape
    out = np.empty((n, 4), dtype=np.uint64)
    L.svt_hash_no_pad_batch(_ptr(rows), n, w, _ptr(out))
    return out


def merkle_level_np(level: np.ndarray) -> np.ndarray:
    """One Merkle 8->4 level: uint64[2m, 4] -> uint64[m, 4]."""
    L = lib()
    assert L is not None
    level = np.ascontiguousarray(level, dtype=np.uint64)
    m = level.shape[0] // 2
    out = np.empty((m, 4), dtype=np.uint64)
    L.svt_merkle_level(_ptr(level.reshape(m, 8)), m, _ptr(out))
    return out


def grind_pow_np(states: np.ndarray, prefixes: np.ndarray,
                 pow_bits: int) -> np.ndarray:
    """Batched PoW grind: states uint64[B, 12], prefixes uint64[B, k]
    -> witnesses uint64[B]."""
    L = lib()
    assert L is not None
    states = np.ascontiguousarray(states, dtype=np.uint64)
    prefixes = np.ascontiguousarray(prefixes, dtype=np.uint64)
    B, k = prefixes.shape if prefixes.ndim == 2 else (states.shape[0], 0)
    out = np.empty(B, dtype=np.uint64)
    L.svt_grind_pow_batch(_ptr(states), _ptr(prefixes), B, k, pow_bits,
                          _ptr(out))
    return out


def ntt_np_inplace(flat: np.ndarray, w_n: int) -> None:
    """Batched radix-2 NTT along the last axis of a C-contiguous
    uint64[nb, n] array, in place. w_n = primitive n-th root of unity.
    Bit-exact with ops/ntt_np.ntt."""
    L = lib()
    assert L is not None and hasattr(L, "svt_ntt_batch")
    assert flat.flags["C_CONTIGUOUS"] and flat.dtype == np.uint64
    L.svt_ntt_batch(_ptr(flat), flat.shape[0], flat.shape[1], np.uint64(w_n))


def coset_lde_np(coeffs: np.ndarray, rate_bits: int, shift: int,
                 w_lde: int) -> np.ndarray:
    """uint64[nb, n] coeffs -> uint64[nb, n << rate_bits] evals on shift*H.
    Bit-exact with ops/ntt_np.coset_lde."""
    L = lib()
    assert L is not None and hasattr(L, "svt_coset_lde_batch")
    coeffs = np.ascontiguousarray(coeffs, dtype=np.uint64)
    nb, n = coeffs.shape
    out = np.empty((nb, n << rate_bits), dtype=np.uint64)
    L.svt_coset_lde_batch(_ptr(coeffs), nb, n, rate_bits,
                          np.uint64(shift), np.uint64(w_lde), _ptr(out))
    return out


def poseidon_fill_np(inputs: np.ndarray, swap: np.ndarray) -> np.ndarray:
    """PoseidonGate witness trace: inputs uint64[12, B], swap uint64[B] ->
    all 135 gate wires uint64[135, B] in gate-wire order (the layout
    core/gates.PoseidonGate defines; fast-partial schedule)."""
    L = lib()
    assert L is not None and hasattr(L, "svt_poseidon_fill_batch")
    B = inputs.shape[1]
    buf = np.zeros((B, 135), dtype=np.uint64, order="C")
    buf[:, 0:12] = inputs.T
    buf[:, 24] = swap
    L.svt_poseidon_fill_batch(_ptr(buf), B)
    return buf.T


def ext2_arith_np(c0: int, c1: int, x, y, z):
    """c0*(x*y) + c1*z over GF(p^2): x/y/z are (comp0, comp1) pairs of
    same-shape uint64 arrays; returns an output pair. One C call replaces
    the ArithmeticExtensionGate generator's ~15 tiny-array numpy ops."""
    L = lib()
    arrs = [np.ascontiguousarray(a, dtype=np.uint64)
            for a in (x[0], x[1], y[0], y[1], z[0], z[1])]
    # the C kernel indexes every operand with [i] for i < n; broadcast any
    # scalar/0-d operand up front so it can never read out of bounds
    shape = np.broadcast_shapes(*(a.shape for a in arrs))
    arrs = [np.ascontiguousarray(np.broadcast_to(a, shape)) for a in arrs]
    o0 = np.empty(arrs[0].shape, dtype=np.uint64)
    o1 = np.empty(arrs[0].shape, dtype=np.uint64)
    L.svt_ext2_arith_batch(c0, c1, *map(_ptr, arrs), _ptr(o0), _ptr(o1),
                           arrs[0].size)
    return o0, o1


def ext2_reduce_chain_np(alpha, acc, coeffs: np.ndarray) -> np.ndarray:
    """Horner chain acc_j = acc_{j-1}*alpha + coeff_j with intermediates:
    alpha/acc are (comp0, comp1) pairs of [B] arrays, coeffs uint64[k, 2, B]
    -> accs uint64[k, 2, B] (the Reducing(Extension)Gate generator body)."""
    L = lib()
    coeffs = np.ascontiguousarray(coeffs, dtype=np.uint64)
    k, _, n = coeffs.shape
    # C indexes alpha/acc components with [i] for i < n; broadcast scalar
    # or 0-d components to (n,) so the kernel can never read out of bounds
    arrs = [np.ascontiguousarray(
                np.broadcast_to(np.asarray(a, dtype=np.uint64), (n,)))
            for a in (alpha[0], alpha[1], acc[0], acc[1])]
    accs = np.empty((k, 2, n), dtype=np.uint64)
    L.svt_ext2_reduce_chain(*map(_ptr, arrs), _ptr(coeffs), _ptr(accs), k, n)
    return accs


def poseidon_eval_np(wires: np.ndarray) -> np.ndarray:
    """All 123 PoseidonGate constraints evaluated pointwise on the base
    field: wires uint64[135, n] (gate-wire order) -> uint64[123, n]
    (constraint order of core/gates.PoseidonGate.eval_unfiltered)."""
    L = lib()
    assert L is not None and hasattr(L, "svt_poseidon_eval_batch")
    wires = np.ascontiguousarray(wires, dtype=np.uint64)
    n = wires.shape[1]
    out = np.empty((123, n), dtype=np.uint64)
    L.svt_poseidon_eval_batch(_ptr(wires), n, _ptr(out))
    return out


def poseidon_eval_planes_np(planes) -> np.ndarray:
    """Same as poseidon_eval_np but takes 135 separate [n] planes (each
    made contiguous individually) — skips materializing the ~135-plane
    block, which costs ~300 MB of copy at the aggregation degrees."""
    L = lib()
    assert L is not None and hasattr(L, "svt_poseidon_eval_batch_p")
    planes = [np.ascontiguousarray(p, dtype=np.uint64).reshape(-1)
              for p in planes]
    n = planes[0].size
    out = np.empty((123, n), dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    ptrs = (u64p * 135)(*[_ptr(p) for p in planes])
    L.svt_poseidon_eval_batch_p(ptrs, n, _ptr(out))
    return out


# ------------------------------------------------------- BN254 bridge plane
_BN_SRC = _REPO / "native" / "svt_bn254.c"
_BN_HDR = _REPO / "native" / "bn254_constants.h"
_BN_SO = _REPO / "native" / "_svt_bn254.so"

_bn_lib = None
_bn_tried = False


def bn254_lib():
    """The BN254 bridge CDLL (native/svt_bn254.c), or None."""
    global _bn_lib, _bn_tried
    if _bn_lib is not None or _bn_tried:
        return _bn_lib
    _bn_tried = True
    if os.environ.get("SVT_NATIVE", "1") != "1":
        return None
    try:
        if not _BN_HDR.exists():
            r = subprocess.run(
                ["python", str(_REPO / "tools" / "gen_bn254_constants.py")],
                capture_output=True)
            if r.returncode != 0:
                return None
        bn_src_mtime = max(_BN_SRC.stat().st_mtime, _BN_HDR.stat().st_mtime)
        if (not _BN_SO.exists()
                or _BN_SO.stat().st_mtime < bn_src_mtime):
            tmp = _BN_SO.with_suffix(".so.tmp")
            cmd = ["gcc", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", str(_BN_SRC), "-o", str(tmp)]
            r = subprocess.run(cmd, capture_output=True)
            if r.returncode != 0:
                cmd = ["gcc", "-O3", "-shared", "-fPIC", str(_BN_SRC),
                       "-o", str(tmp)]
                r = subprocess.run(cmd, capture_output=True)
            if r.returncode != 0:
                return None
            os.replace(tmp, _BN_SO)
        L = ctypes.CDLL(str(_BN_SO))
        u64p = ctypes.POINTER(ctypes.c_uint64)
        L.svt_bridge_permute_batch.argtypes = [u64p, ctypes.c_int64]
        L.svt_bn254_permute_fr_batch.argtypes = [u64p, ctypes.c_int64]
        _bn_lib = L
    except Exception:
        _bn_lib = None
    return _bn_lib


def bridge_permute12_np(state: np.ndarray) -> np.ndarray:
    """Width-12 bridge permutation on stacked state uint64[12, ...]."""
    L = bn254_lib()
    assert L is not None
    trailing = state.shape[1:]
    flat = np.array(
        np.moveaxis(state, 0, -1).reshape(-1, 12), dtype=np.uint64,
        copy=True, order="C")
    L.svt_bridge_permute_batch(_ptr(flat), flat.shape[0])
    return np.moveaxis(flat.reshape(trailing + (12,)), -1, 0)


def bn254_permute_fr_np(states: np.ndarray) -> np.ndarray:
    """t=5 Fr permutation: uint64[n, 5, 4] little-endian limbs, canonical
    (non-Montgomery) in and out."""
    L = bn254_lib()
    assert L is not None
    flat = np.array(states, dtype=np.uint64, copy=True, order="C")
    n = flat.shape[0]
    L.svt_bn254_permute_fr_batch(_ptr(flat), n)
    return flat


def gl_mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise canonical Goldilocks multiply (same-shape arrays)."""
    L = lib()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty(a.shape, dtype=np.uint64)
    L.svt_gl_mul(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out


def gl_add_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise a + b mod p (same-shape arrays; one fused pass vs the
    numpy model's 5)."""
    L = lib()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty(a.shape, dtype=np.uint64)
    L.svt_gl_add_arr(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out


def gl_sub_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise a - b mod p (any u64 representatives)."""
    L = lib()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty(a.shape, dtype=np.uint64)
    L.svt_gl_sub_arr(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out
