"""Reduced-domain ROM constant scaling.

The fork_5 zkASM program bakes N = 2^23-derived limits into folded line
constants (rom.json `constants`: TOTAL_STEPS_LIMIT = N, MAX_CNT_ARITH =
N/32 - (N/32)/20, ...).  JMPN comparison values against these limits are
range-checked through `lJmpnCondValue in STEP` (main.pil:208) whose table
spans exactly the proving domain, so an honest proof at n < 2^23 needs the
same program with its N-derived constants re-derived for n — branch
behavior is unchanged as long as the batch fits the scaled limits (the
executor still fails loudly on counter overflow otherwise).

The production domain (2^23) uses the ROM verbatim; scaling exists only
for reduced-domain instantiation (models/zkevm.py).  The formulas below
reproduce the shipped fork_5 values exactly at n = 2^23 (verified in
tests/test_zkevm_prove.py): LIMITs are N/32, N/16, N/56, N/30, 44 keccak
lanes per 155286-row slot, and MAX_CNT_X = LIMIT - LIMIT//20
(SAFE_RANGE = 20).
"""

from __future__ import annotations

import copy
import re
from typing import Dict

KECCAK_SLOT_ROWS = 155286


def scaled_constants(n: int) -> Dict[str, int]:
    def with_safety(limit: int) -> int:
        return limit - limit // 20

    lim = {
        "TOTAL_STEPS_LIMIT": n,
        "MAX_CNT_STEPS_LIMIT": n - 200,
        "MAX_CNT_ARITH_LIMIT": n // 32,
        "MAX_CNT_BINARY_LIMIT": n // 16,
        "MAX_CNT_MEM_ALIGN_LIMIT": n // 32,
        "MAX_CNT_KECCAK_F_LIMIT": 44 * (n // KECCAK_SLOT_ROWS),
        "MAX_CNT_PADDING_PG_LIMIT": n // 56,
        "MAX_CNT_POSEIDON_G_LIMIT": n // 30,
        # memory expansion bound: N/2 - 32 at production
        "MAX_MEM_EXPANSION_BYTES": n // 2 - 32,
        # at production the 30M consensus value works through the 9-bit
        # high decomposition (values < 2^32); below 2^23 even the low-23
        # part must fit the STEP table, so demo batches must use tx gas
        # limits under n/2
        "TX_GAS_LIMIT": 30_000_000 if n >= (1 << 23) else n // 2,
    }
    out = dict(lim)
    for name in ("STEPS", "ARITH", "BINARY", "MEM_ALIGN", "KECCAK_F",
                 "PADDING_PG", "POSEIDON_G"):
        out[f"MAX_CNT_{name}"] = with_safety(lim[f"MAX_CNT_{name}_LIMIT"])
    return out


def scale_rom(data: dict, n_bits: int) -> dict:
    """rom.json dict -> deep-copied dict with N-derived folded constants
    rebased from their shipped values to the n = 2^n_bits derivation."""
    n = 1 << n_bits
    new = scaled_constants(n)
    orig = {k: int(v["value"]) for k, v in data.get("constants", {}).items()
            if v.get("type") == "CONST" and k in new}
    missing = set(new) - set(orig)
    assert not missing, f"ROM constants table lacks {missing}"

    out = copy.deepcopy(data)
    for k in orig:
        out["constants"][k]["value"] = str(new[k])

    pat = re.compile(r"%([A-Z_0-9]+)")
    for line in out["program"]:
        s = line.get("lineStr", "")
        if "CONST" not in line and "CONSTL" not in line:
            continue
        names = [m for m in pat.findall(s) if m in orig]
        if not names:
            continue
        # the one-signed-occurrence rebase below is only valid when the
        # constant appears exactly once, unscaled: multiple occurrences,
        # mixed signs, or a multiplied use (e.g. 2*%MAX_CNT_X) would fold
        # a different delta — fail loudly rather than rebase wrongly
        assert len(names) == 1, f"multiple scalable-const occurrences: {s}"
        name = names[0]
        assert not re.search(r"[\w)]\s*\*\s*%" + name + r"\b", s) and \
            not re.search(r"%" + name + r"\s*\*", s) and \
            not re.search(r"%" + name + r"\s*/", s), \
            f"scaled/divided use of %{name} not rebasable: {s}"
        sign = -1 if re.search(r"-\s*%" + name + r"\b", s) else 1
        delta = sign * (new[name] - orig[name])
        key = "CONST" if "CONST" in line else "CONSTL"
        line[key] = str(int(line[key]) + delta)
    return out
