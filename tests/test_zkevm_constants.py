"""zkEVM constant-polynomial builders (pil-stark buildConstants role;
VERDICT r1 item 36)."""

import os

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.models import zkevm_constants as zc

ROM = "/root/reference/src/main_sm/fork_5/scripts/rom.json"
needs_ref = pytest.mark.skipif(not os.path.exists(ROM),
                               reason="reference ROM not present")


def test_global_tables():
    n = 1 << 10
    g = zc.global_constants(n)
    assert g["Global.L1"][0] == 1 and g["Global.L1"].sum() == 1
    assert g["Global.LLAST"][n - 1] == 1 and g["Global.LLAST"].sum() == 1
    assert g["Global.BYTE"][300] == 44
    assert g["Global.STEP"][77] == 77
    assert g["Global.CLK32[5]"][5] == 1 and g["Global.CLK32[5]"][6] == 0


@needs_ref
def test_rom_constants_match_program():
    import json

    n = 1 << 13
    r = zc.rom_constants(ROM, n)
    prog = json.load(open(ROM))["program"]
    # line 0: STEP => A  (inSTEP=1, setA)
    assert r["Rom.inSTEP"][0] == 1
    ops0 = int(r["Rom.operations"][0])
    assert ops0 & (1 << zc.ROM_OPERATION_FLAGS.index("setA"))
    # spot-check a CONSTL line
    for i, l in enumerate(prog):
        if "CONSTL" in l:
            v = int(l["CONSTL"])
            got = sum(int(r[f"Rom.CONST{j}"][i]) << (32 * j)
                      for j in range(8))
            assert got == v % (1 << 256)
            break


def test_poseidon_g_layout():
    n = 1 << 10
    pg = zc.poseidon_g_constants(n)
    from merlin_zkevm_prover_tpu.ops.poseidon_constants import \
        ROUND_CONSTANTS

    assert pg["PoseidonG.C[0]"][0] == ROUND_CONSTANTS[0] % ((1 << 64) -
                                                            (1 << 32) + 1)
    assert pg["PoseidonG.LAST"][30] == 1
    assert pg["PoseidonG.PARTIAL"][4] == 1
    assert pg["PoseidonG.PARTIAL"][3] == 0


def test_binary_table_semantics():
    # ADD byte: 200 + 100 + 1 = 301 -> c=45, cout=1
    c, cout, use = zc._binary_byte(0, 1, 0, 200, 100)
    assert (c, cout) == (45, 1)
    # LT chain: a<b at this byte -> cout 1
    c, cout, use = zc._binary_byte(2, 0, 1, 3, 5)
    assert (c, cout, use) == (1, 1, 1)
    # EQ chain: equal and cin=1 stays 1
    c, cout, use = zc._binary_byte(4, 1, 0, 9, 9)
    assert cout == 1 and c == 0


@needs_ref
def test_build_all_shapes():
    n = 1 << 13
    out = zc.build_all(n)
    assert len(out) >= 140
    for name, col in out.items():
        assert col.shape == (n,), name
