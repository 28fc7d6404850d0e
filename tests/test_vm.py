"""Scan-VM evaluator vs the hash-consed tree evaluator — bit-exact on
the REAL zkEVM step programs (random section data at a tiny domain; the
programs are domain-independent, so this pins the full compile+ISA+
register-allocation path without a 2^18 trace)."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops import goldilocks3 as gl3
from merlin_zkevm_prover_tpu.ops.goldilocks import GL, P, SHIFT
from merlin_zkevm_prover_tpu.stark import device_core as core
from merlin_zkevm_prover_tpu.stark import vm as vm_mod
from merlin_zkevm_prover_tpu.stark.evaluator import EvalContext, eval_program

PIL = "/root/reference/src/main_sm/fork_5/scripts/main.pil.json"

import os

needs_ref = pytest.mark.skipif(not os.path.exists(PIL),
                               reason="reference PIL not present")

N_BITS = 6


@pytest.fixture(scope="module")
def zinfo():
    from merlin_zkevm_prover_tpu.models.zkevm import (
        build_zkevm_air,
        compile_zkevm,
    )

    air = build_zkevm_air(n_bits=N_BITS, reparam_jmpn=True)
    return compile_zkevm(air, n_queries=2)


def _rand_gl(rng, shape):
    return gl.from_u64(rng.integers(0, P, shape, dtype=np.uint64))


@pytest.fixture(scope="module")
def data(zinfo):
    info = zinfo
    rng = np.random.default_rng(3)
    n, n_ext = info.n, info.n_ext
    d = {
        "cm1_n": _rand_gl(rng, (n, info.section_widths["cm1_n"])),
        "cm2_n": _rand_gl(rng, (n, info.section_widths["cm2_n"])),
        "cm3_n": _rand_gl(rng, (n, info.section_widths["cm3_n"])),
        "cm1_2ns": _rand_gl(rng, (n_ext, info.section_widths["cm1_n"])),
        "cm2_2ns": _rand_gl(rng, (n_ext, info.section_widths["cm2_n"])),
        "cm3_2ns": _rand_gl(rng, (n_ext, info.section_widths["cm3_n"])),
        "const_n": _rand_gl(rng, (n, info.n_constants)),
        "const_2ns": _rand_gl(rng, (n_ext, info.n_constants)),
        "ch": gl3.from_u64(rng.integers(0, P, (8, 3), dtype=np.uint64)),
        "pub": _rand_gl(rng, (info.n_publics,)),
        "x_n": gl.from_u64(gl.powers_np(gl.w(info.n_bits), n)),
        "x_2ns": gl.from_u64(
            gl.powers_np(gl.w(info.n_bits_ext), n_ext, start=SHIFT)),
    }
    blow = 1 << info.blowup_bits
    sn = pow(SHIFT, n, P)
    zi_period = np.array(
        [pow((sn * pow(gl.w(info.blowup_bits), i, P) - 1) % P, P - 2, P)
         for i in range(blow)], dtype=np.uint64)
    d["zi"] = gl.from_u64(np.tile(zi_period, n))
    return d


def _to3(v):
    return v if isinstance(v, gl3.GL3) else gl3.from_base(v)


def _eq3(a, b):
    return (np.array_equal(gl3.to_u64(_to3(a)), gl3.to_u64(_to3(b))))


@needs_ref
def test_vm_step2_matches_evaluator(zinfo, data):
    info = zinfo
    prog = vm_mod.compile_program(info.step2prev, info, "n",
                                  ["cm1_n", "const"])
    out = core.step2_vm(info, prog, {"cm1_n": data["cm1_n"]},
                        data["const_n"], data["ch"], data["pub"],
                        data["x_n"])
    ctx = EvalContext(info=info, domain="n",
                      sections={"cm1_n": data["cm1_n"]},
                      const=data["const_n"], challenges=data["ch"],
                      publics=data["pub"], x=data["x_n"])
    ref = eval_program(info.step2prev, ctx)
    for (dk, did), v in ref.items():
        assert _eq3(out[did], v), f"exp {did} diverges"


@needs_ref
def test_vm_step3_matches_evaluator(zinfo, data):
    info = zinfo
    prog = vm_mod.compile_program_ordered(
        info.step3prev, info, "n", ["cm1_n", "cm2_n", "const"])
    secs = {"cm1_n": data["cm1_n"], "cm2_n": data["cm2_n"]}
    out = core.step3_vm(info, prog, secs, data["const_n"], data["ch"],
                        data["pub"], data["x_n"])
    ctx = EvalContext(info=info, domain="n", sections=secs,
                      const=data["const_n"], challenges=data["ch"],
                      publics=data["pub"], x=data["x_n"])
    ref = eval_program(info.step3prev, ctx)
    for (dk, did), v in ref.items():
        assert _eq3(out[did], v), f"cm {did} diverges"


@needs_ref
def test_vm_step4_matches_chunked(zinfo, data):
    info = zinfo
    prog = vm_mod.compile_program(
        [(("acc", 0), info.c_exp)], info, "ext",
        ["cm1_2ns", "cm2_2ns", "cm3_2ns", "const"])
    secs = {"cm1_2ns": data["cm1_2ns"], "cm2_2ns": data["cm2_2ns"],
            "cm3_2ns": data["cm3_2ns"]}
    cm4_vm = core.step4_vm(info, prog, secs, data["const_2ns"],
                           data["ch"], data["pub"], data["x_2ns"],
                           data["zi"])
    acc = gl3.zeros((info.n_ext,))
    K = len(info.constraints)
    for k0 in range(0, K, 64):
        acc = core.step4_chunk(info, k0, min(k0 + 64, K), secs,
                               data["const_2ns"], data["ch"], data["pub"],
                               data["x_2ns"], data["zi"], acc)
    cm4_ref = core.step4_finalize(info, acc, data["zi"])
    assert np.array_equal(gl.to_u64(cm4_vm), gl.to_u64(cm4_ref))
