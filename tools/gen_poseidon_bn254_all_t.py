"""Regenerate ops/poseidon_bn254_all_t.npz from the reference's circomlib
constant tables (reference src/poseidon_opt/constants_opt.hpp — public
circomlib data, stored there as 4x64-bit Montgomery limbs).

Each npz entry ``{C|M|P|S}_{t}`` is an (n, 32) uint8 array of big-endian
standard-form Fr values, flattened in the reference's nesting order
(M/P row-major t x t).  The t=17 slice is cross-checked against the
hand-transcribed tables in ops/poseidon_bn254_constants.py.

Usage: python tools/gen_poseidon_bn254_all_t.py [ref_hpp] [out_npz]
"""

import re
import sys

import numpy as np

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
R_INV = pow(pow(2, 256, P), P - 2, P)


def parse_group(t, i):
    assert t[i] == "{"
    i += 1
    out = []
    while True:
        while i < len(t) and t[i] in " \n\t\r,":
            i += 1
        if t[i] == "}":
            return out, i + 1
        if t[i] == "{":
            g, i = parse_group(t, i)
            out.append(g)
        else:
            m = re.match(r"0x[0-9A-Fa-f]+", t[i:])
            assert m, t[i:i + 40]
            out.append(int(m.group(0), 16))
            i += m.end()


def conv(node):
    if isinstance(node, list) and len(node) == 4 and all(
            isinstance(x, int) for x in node):
        v = node[0] | node[1] << 64 | node[2] << 128 | node[3] << 192
        return v * R_INV % P
    return [conv(x) for x in node]


def flat(node, acc):
    if isinstance(node, int):
        acc.append(node)
    else:
        for x in node:
            flat(x, acc)
    return acc


def main():
    hpp = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/src/poseidon_opt/constants_opt.hpp")
    out_path = sys.argv[2] if len(sys.argv) > 2 else (
        "merlin_zkevm_prover_tpu/ops/poseidon_bn254_all_t.npz")
    src = open(hpp).read()
    data = {}
    for n in ("C", "M", "P", "S"):
        m = re.search(r">\s+" + n + r"\s*=\s*\{", src)
        start = m.end() - 1
        depth, i = 0, start
        while True:
            if src[i] == "{":
                depth += 1
            elif src[i] == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        groups, _ = parse_group(src[start:i + 1], 0)
        for ti, sub in enumerate(conv(groups)):
            a = flat(sub, [])
            data[f"{n}_{ti + 2}"] = np.frombuffer(
                b"".join(v.to_bytes(32, "big") for v in a), dtype=np.uint8
            ).reshape(len(a), 32)
    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path}: t=2..17 C/M/P/S tables")


if __name__ == "__main__":
    main()
