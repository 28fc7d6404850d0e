"""Compiled-PIL (pilcom JSON) importer.

Loads the reference's compiled constraint systems (e.g.
src/main_sm/fork_5/scripts/main.pil.json: 665 committed polynomials, 218
constants, 631 polynomial identities, 28 plookups, 18 permutations, 2
connections) into the framework's AIR, from which `compile_air` produces
the proving StarkInfo.  This replaces the pil-stark starkinfo pipeline the
reference depends on offline.

Constant-polynomial *values* are not part of the PIL JSON (pil-stark
generates them in buildConstants); pass them via `const_values` or leave
zeros for structural use.
"""

from __future__ import annotations

import json
import math
from typing import Dict, List, Optional

import numpy as np

from ..ops.goldilocks import P
from .air import AIR, Expr
from .compiler import rotate


def import_pil(source, const_values: Optional[np.ndarray] = None,
               name: str = "pil") -> AIR:
    """source: path or parsed pilcom JSON -> AIR."""
    if isinstance(source, str):
        with open(source) as f:
            pil = json.load(f)
    else:
        pil = source

    n_commitments = pil["nCommitments"]
    n_constants = pil["nConstants"]
    # degree from any reference
    pol_deg = None
    for ref in pil["references"].values():
        pol_deg = ref.get("polDeg")
        if pol_deg:
            break
    n_bits = int(math.log2(pol_deg))
    assert (1 << n_bits) == pol_deg

    air = AIR(name, n_bits)
    air.cm_names = [f"cm{i}" for i in range(n_commitments)]
    # constant columns: values are provided at prove time (pil-stark's
    # buildConstants role); register names only to avoid materializing
    # 2^23-row zero columns here
    for i in range(n_constants):
        air.const_names.append(f"const{i}")
        air.const_values.append(
            None if const_values is None else
            const_values[:, i].astype(np.uint64)
        )

    # name the references for debuggability (arrays expand to name[i])
    for ref_name, ref in pil["references"].items():
        rid = ref["id"]
        count = ref.get("len", 1) if ref.get("isArray") else 1
        names = air.cm_names if ref["type"] == "cmP" else (
            air.const_names if ref["type"] == "constP" else None
        )
        if names is None:
            continue
        for k in range(count):
            if rid + k < len(names):
                names[rid + k] = ref_name if count == 1 else f"{ref_name}[{k}]"

    expressions = pil["expressions"]
    memo: Dict[int, Expr] = {}

    def build(e: dict) -> Expr:
        op = e["op"]
        if op == "cm":
            ex = Expr("cm", id=e["id"])
            return rotate(ex) if e.get("next") else ex
        if op == "const":
            ex = Expr("const", id=e["id"])
            return rotate(ex) if e.get("next") else ex
        if op == "number":
            s = str(e["value"])
            v = int(s, 16) if s.startswith("0x") else int(s)
            return Expr("number", value=v % P)
        if op == "public":
            return Expr("public", id=e["id"])
        if op == "exp":
            sub = resolve(e["id"])
            return rotate(sub) if e.get("next") else sub
        if op == "add":
            return build(e["values"][0]) + build(e["values"][1])
        if op == "sub":
            return build(e["values"][0]) - build(e["values"][1])
        if op == "mul":
            return build(e["values"][0]) * build(e["values"][1])
        if op == "neg":
            return -build(e["values"][0])
        raise ValueError(f"unknown PIL expression op '{op}'")

    def resolve(eid: int) -> Expr:
        if eid not in memo:
            memo[eid] = build(expressions[eid])
        return memo[eid]

    # publics: bound to committed polynomial values at a row, enforced with
    # a row-selector constraint (the reference enforces the binding in the
    # circom verifier instead)
    for pub in sorted(pil.get("publics", []), key=lambda p: p["id"]):
        assert pub["polType"] == "cmP", pub
        assert pub["id"] == len(air.publics)
        air.publics.append((pub["name"], pub["polId"], pub["idx"]))
        lrow = air.row_selector(pub["idx"])
        air.constraint(
            lrow * (Expr("cm", id=pub["polId"]) - Expr("public", id=pub["id"]))
        )

    # identities
    for ident in pil["polIdentities"]:
        air.constraint(resolve(ident["e"]))
    for ident in pil.get("plookupIdentities", []):
        f = [resolve(i) for i in ident["f"]]
        t = [resolve(i) for i in ident["t"]]
        f_sel = resolve(ident["selF"]) if ident.get("selF") is not None else None
        t_sel = resolve(ident["selT"]) if ident.get("selT") is not None else None
        air.lookup(f, t, f_sel, t_sel)
    for ident in pil.get("permutationIdentities", []):
        f = [resolve(i) for i in ident["f"]]
        t = [resolve(i) for i in ident["t"]]
        f_sel = resolve(ident["selF"]) if ident.get("selF") is not None else None
        t_sel = resolve(ident["selT"]) if ident.get("selT") is not None else None
        air.permutation(f, t, f_sel, t_sel)
    for ident in pil.get("connectionIdentities", []):
        cols = [resolve(i) for i in ident["pols"]]
        s_cols = [resolve(i) for i in ident["connections"]]
        air.connection(cols, s_cols)

    return air
