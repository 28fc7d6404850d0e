"""PIL conformance checker: evaluate the real zkEVM constraint system on
framework-produced traces.

Proving the full 665-column PIL requires every identity to hold; this tool
measures the distance: it evaluates each polIdentity of a compiled PIL
over the n-domain given named committed columns (from the executor's
recorders) and named constants (models/zkevm_constants.py), and reports
violations grouped by the PIL source file.  Unmapped columns default to
zero, so the report doubles as a column-coverage map — the round-by-round
driver toward full-PIL proving (reference parity: pil-stark's
`main_checker` role).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops.goldilocks import GL, P
from .air import Expr
from .pil_importer import import_pil


@dataclass
class ConformanceReport:
    n: int
    total_identities: int
    passed: List[int] = field(default_factory=list)
    failed: Dict[int, int] = field(default_factory=dict)  # idx -> violations
    by_file: Dict[str, Tuple[int, int]] = field(default_factory=dict)
    mapped_cm: int = 0
    mapped_const: int = 0

    @property
    def n_passed(self):
        return len(self.passed)

    def summary(self) -> str:
        lines = [
            f"PIL conformance: {self.n_passed}/{self.total_identities} "
            f"identities hold on the {self.n}-row trace "
            f"({self.mapped_cm} cm / {self.mapped_const} const columns mapped)"
        ]
        for fn in sorted(self.by_file):
            ok, tot = self.by_file[fn]
            lines.append(f"  {fn}: {ok}/{tot}")
        return "\n".join(lines)


def _eval(e: Expr, cm, const, publics: Dict[int, int],
          memo: Dict) -> GL:
    """cm/const: dict id -> GL column (lazy; missing ids read as zero)."""
    hit = memo.get(e)
    if hit is not None:
        return hit
    k = e.kind
    if k == "cm":
        v = cm(e.id)
        if e.prime:
            v = GL(jnp.roll(v.lo, -1), jnp.roll(v.hi, -1))
    elif k == "const":
        v = const(e.id)
        if e.prime:
            v = GL(jnp.roll(v.lo, -1), jnp.roll(v.hi, -1))
    elif k == "number":
        v = gl.const(e.value)
    elif k == "public":
        v = gl.const(publics.get(e.id, 0))
    elif k == "add":
        v = gl.add(_eval(e.args[0], cm, const, publics, memo),
                   _eval(e.args[1], cm, const, publics, memo))
    elif k == "sub":
        v = gl.sub(_eval(e.args[0], cm, const, publics, memo),
                   _eval(e.args[1], cm, const, publics, memo))
    elif k == "mul":
        v = gl.mul(_eval(e.args[0], cm, const, publics, memo),
                   _eval(e.args[1], cm, const, publics, memo))
    elif k == "neg":
        v = gl.neg(_eval(e.args[0], cm, const, publics, memo))
    else:
        raise ValueError(f"unsupported kind {k} in conformance check")
    memo[e] = v
    return v


@dataclass
class ArgumentReport:
    """Satisfaction of the PIL's plookup/permutation/connection arguments
    on a concrete trace (the polIdentity report's sibling: a proof only
    verifies if these multiset/copy relations hold too)."""
    n: int
    passed: List[str] = field(default_factory=list)
    failed: Dict[str, str] = field(default_factory=dict)  # tag -> detail

    @property
    def ok(self):
        return not self.failed

    def summary(self) -> str:
        lines = [f"PIL arguments on {self.n}-row trace: "
                 f"{len(self.passed)} hold, {len(self.failed)} fail"]
        for tag, why in self.failed.items():
            lines.append(f"  FAIL {tag}: {why}")
        return "\n".join(lines)


def column_evaluator(air, cm_cols: Dict[str, np.ndarray],
                     const_cols: Dict[str, np.ndarray], n: int,
                     publics: Optional[Dict[int, int]] = None):
    """ev(expr) -> (n,) uint64 over named trace/const columns (missing
    columns read as zero)."""
    zero = gl.from_u64(np.zeros(n, dtype=np.uint64))

    def lazy(named_cols, names):
        cache: Dict[int, GL] = {}

        def get(i: int) -> GL:
            v = cache.get(i)
            if v is None:
                col = named_cols.get(names[i])
                if col is None:
                    v = zero
                else:
                    buf = np.zeros(n, dtype=np.uint64)
                    buf[: min(len(col), n)] = col[:n]
                    v = gl.from_u64(buf)
                cache[i] = v
            return v

        return get

    cm = lazy(cm_cols, air.cm_names)
    const = lazy(const_cols, air.const_names)
    publics = publics or {}
    memo: Dict = {}

    def ev(e: Expr) -> np.ndarray:
        v = np.asarray(gl.to_u64(_eval(e, cm, const, publics, memo)))
        return np.broadcast_to(v, (n,))  # scalar exprs (e.g. numbers)

    return ev


def check_arguments(pil_source, cm_cols: Dict[str, np.ndarray],
                    const_cols: Dict[str, np.ndarray], n_bits: int,
                    publics: Optional[Dict[int, int]] = None,
                    strict: bool = True,
                    air=None) -> ArgumentReport:
    """Check every plookup (f ⊆ t), permutation (multiset f == t) and
    connection (copy-constraint cycles) of the PIL on named trace/const
    columns.  Host-exact (numpy u64 → python int tuples); selectors must
    be boolean, mirroring the challenge-compression argument the prover
    lowers these to (compiler.py PuCtx/PeCtx/CiCtx)."""
    if isinstance(pil_source, str):
        with open(pil_source) as f:
            pil = json.load(f)
    else:
        pil = pil_source
    n = 1 << n_bits
    if air is None:
        air = import_pil(pil, name="argcheck", n_bits=n_bits)
    cm_cols = resolve_columns(cm_cols, air.cm_names, strict=strict)
    const_cols = resolve_columns(const_cols, air.const_names, strict=False)

    ev = column_evaluator(air, cm_cols, const_cols, n, publics)

    def sel_rows(sel: Optional[Expr], tag: str, rep) -> np.ndarray:
        if sel is None:
            return np.ones(n, dtype=bool)
        v = ev(sel)
        bad = np.sum((v != 0) & (v != 1))
        if bad:
            rep.failed.setdefault(tag, f"non-boolean selector ({bad} rows)")
        return v == 1

    def rows_as_tuples(cols: List[np.ndarray], mask: np.ndarray):
        sel = np.nonzero(mask)[0]
        stacked = np.stack([c[sel] for c in cols], axis=1)
        return [tuple(int(x) for x in row) for row in stacked], sel

    rep = ArgumentReport(n=n)

    def _src(ident):
        return f"{ident.get('fileName', '?')}:{ident.get('line', '?')}"

    for li, lk in enumerate(air.lookups):
        tag = f"plookup#{li} {_src(pil['plookupIdentities'][li])}"
        fm = sel_rows(lk.f_sel, tag, rep)
        tm = sel_rows(lk.t_sel, tag, rep)
        if tag in rep.failed:
            continue
        fr, fsel = rows_as_tuples([ev(e) for e in lk.f_cols], fm)
        tr, _ = rows_as_tuples([ev(e) for e in lk.t_cols], tm)
        tset = set(tr)
        missing = [(int(r), t) for r, t in zip(fsel, fr) if t not in tset]
        if missing:
            rep.failed[tag] = (f"{len(missing)}/{len(fr)} f-rows not in "
                               f"table (|t|={len(tset)} distinct); first: "
                               f"row {missing[0][0]} -> {missing[0][1]}")
        else:
            rep.passed.append(tag)

    from collections import Counter

    for pi, pe in enumerate(air.permutations):
        tag = f"perm#{pi} {_src(pil['permutationIdentities'][pi])}"
        fm = sel_rows(pe.f_sel, tag, rep)
        tm = sel_rows(pe.t_sel, tag, rep)
        if tag in rep.failed:
            continue
        fr, _ = rows_as_tuples([ev(e) for e in pe.f_cols], fm)
        tr, _ = rows_as_tuples([ev(e) for e in pe.t_cols], tm)
        cf, ct = Counter(fr), Counter(tr)
        if cf != ct:
            fonly = cf - ct
            tonly = ct - cf
            ex_f = next(iter(fonly.items()), None)
            ex_t = next(iter(tonly.items()), None)
            rep.failed[tag] = (f"multiset mismatch: |f|={len(fr)} |t|="
                               f"{len(tr)}; f-only {sum(fonly.values())} "
                               f"(e.g. {ex_f}), t-only "
                               f"{sum(tonly.values())} (e.g. {ex_t})")
        else:
            rep.passed.append(tag)

    # connections: sigma maps positions (col j, row r) -> (col j2, r2)
    # encoded as sigma_j(r) = 7^j2 * w^r2; the argument holds iff the
    # referenced cells are equal along every cycle (compiler.py:351-364).
    if air.connections:
        nb = n_bits
        wn = gl.w(nb)
        # position decode table: value -> (col, row)
        for ci, cn in enumerate(air.connections):
            tag = f"conn#{ci} {_src(pil['connectionIdentities'][ci])}"
            k_vals = [pow(7, j, P) for j in range(len(cn.cols))]
            xs = np.empty(n, dtype=np.uint64)
            cur = 1
            for r in range(n):
                xs[r] = cur
                cur = cur * wn % P
            pos: Dict[int, tuple] = {}
            for j, kj in enumerate(k_vals):
                vals = (xs.astype(object) * kj % P)
                for r, v in enumerate(vals):
                    pos[int(v)] = (j, r)
            cols = [ev(e) for e in cn.cols]
            sig = [ev(e) for e in cn.s_cols]
            bad = 0
            example = None
            for j in range(len(cols)):
                for r in range(n):
                    tgt = pos.get(int(sig[j][r]))
                    if tgt is None:
                        bad += 1
                        if example is None:
                            example = f"sigma[{j}][{r}] not a position"
                        continue
                    j2, r2 = tgt
                    if int(cols[j][r]) != int(cols[j2][r2]):
                        bad += 1
                        if example is None:
                            example = (f"cell ({j},{r})={int(cols[j][r])} != "
                                       f"({j2},{r2})={int(cols[j2][r2])}")
            if bad:
                rep.failed[tag] = f"{bad} cells violate copy cycles; {example}"
            else:
                rep.passed.append(tag)
    return rep


def check_conformance(pil_source, cm_cols: Dict[str, np.ndarray],
                      const_cols: Dict[str, np.ndarray], n_bits: int,
                      publics: Optional[Dict[int, int]] = None,
                      rows_mask: Optional[np.ndarray] = None,
                      strict: bool = True,
                      files=None) -> ConformanceReport:
    """cm_cols/const_cols: PIL-name -> (n,) uint64 arrays.  rows_mask:
    optional bool array — violations only counted where True (e.g. mask
    off padding rows).  strict: raise if a provided cm column does not
    resolve to a PIL name (unmapped columns silently default to zero
    and can make selector-gated identities pass vacuously).  files:
    optional set of PIL fileNames — only their identities evaluated
    (columns load lazily, so a namespace subset stays cheap at big n)."""
    if isinstance(pil_source, str):
        with open(pil_source) as f:
            pil = json.load(f)
    else:
        pil = pil_source
    n = 1 << n_bits
    air = import_pil(pil, name="conformance")
    cm_cols = resolve_columns(cm_cols, air.cm_names, strict=strict)
    const_cols = resolve_columns(const_cols, air.const_names, strict=False)

    zero = gl.from_u64(np.zeros(n, dtype=np.uint64))

    def lazy(named_cols, names):
        cache: Dict[int, GL] = {}

        def get(i: int) -> GL:
            v = cache.get(i)
            if v is None:
                col = named_cols.get(names[i])
                if col is None:
                    v = zero
                else:
                    buf = np.zeros(n, dtype=np.uint64)
                    buf[: min(len(col), n)] = col[:n]
                    v = gl.from_u64(buf)
                cache[i] = v
            return v

        return get

    cm = lazy(cm_cols, air.cm_names)
    const = lazy(const_cols, air.const_names)
    mapped_cm = sum(1 for name in air.cm_names if name in cm_cols)
    mapped_const = sum(1 for name in air.const_names if name in const_cols)
    publics = publics or {}

    report = ConformanceReport(
        n=n, total_identities=len(pil["polIdentities"]),
        mapped_cm=mapped_cm, mapped_const=mapped_const,
    )
    memo: Dict = {}
    mask = None
    if rows_mask is not None:
        mask = jnp.asarray(rows_mask[:n])

    # resolve identity expressions through the importer's machinery: they
    # are exactly air.constraints after the publics pins
    n_pub_pins = len(air.publics)
    identities = air.constraints[n_pub_pins:]
    assert len(identities) == len(pil["polIdentities"])
    for idx, (expr, ident) in enumerate(zip(identities,
                                            pil["polIdentities"])):
        if files is not None and ident.get("fileName") not in files:
            continue
        v = _eval(expr, cm, const, publics, memo)
        nz = (v.lo != 0) | (v.hi != 0)
        if mask is not None:
            nz = nz & mask
        violations = int(jnp.sum(nz))
        fn = ident.get("fileName", "?")
        ok, tot = report.by_file.get(fn, (0, 0))
        if violations == 0:
            report.passed.append(idx)
            report.by_file[fn] = (ok + 1, tot + 1)
        else:
            report.failed[idx] = violations
            report.by_file[fn] = (ok, tot + 1)
    return report


_SM_NAMESPACES = (
    ("main", "Main"), ("arith", "Arith"), ("binary", "Binary"),
    ("memory", "Mem"), ("memAlign", "MemAlign"), ("storage", "Storage"),
    ("poseidonG", "PoseidonG"), ("paddingPG", "PaddingPG"),
    ("paddingKK", "PaddingKK"), ("paddingKKBit", "PaddingKKBit"),
    ("bits2field", "Bits2Field"), ("keccakF", "KeccakF"),
)

_ARRAY_RE = re.compile(r"(.+?)_?(\d+)")


def resolve_columns(raw: Dict[str, np.ndarray], valid_names,
                    strict: bool = True) -> Dict[str, np.ndarray]:
    """Resolve producer column names onto the AIR's PIL names.

    Producers use flat names (``selEq0``, ``a3``, ``m0_1``); the PIL
    declares arrays (``selEq[0]``).  Exact matches win; otherwise the
    trailing index is rewritten to array syntax.  Unresolvable producer
    names are an error under ``strict`` — a silently dropped column
    defaults to zero in the checker and can make selector-gated
    identities pass vacuously (that bug hid a real arith trace-format
    mismatch in round 2)."""
    valid = set(valid_names)
    out: Dict[str, np.ndarray] = {}
    unresolved = []
    for full, col in raw.items():
        if full in valid:
            out[full] = col
            continue
        ns, name = full.split(".", 1)
        m = _ARRAY_RE.fullmatch(name)
        if m:
            cand = f"{ns}.{m.group(1)}[{int(m.group(2))}]"
            if cand in valid:
                out[cand] = col
                continue
        unresolved.append(full)
    if unresolved and strict:
        raise ValueError(
            f"{len(unresolved)} producer columns do not resolve to PIL "
            f"cm names: {unresolved[:20]}")
    return out


_PUBLIC_INPUT_KEYS = {
    "oldStateRoot": "oldStateRoot", "oldAccInputHash": "oldAccInputHash",
    "oldBatchNum": "oldNumBatch", "chainId": "chainID", "forkId": "forkID",
    "newStateRoot": "newStateRoot", "newAccInputHash": "newAccInputHash",
    "localExitRoot": "newLocalExitRoot", "newBatchNum": "newNumBatch",
}


def zkevm_publics(pil, input_data: dict) -> Dict[int, int]:
    """Expected public values from the batch input (reference
    prover.cpp:461-526 publics extraction): 256-bit scalars split into
    the 8x32-bit limb each public's pinned cm column carries."""
    id_to_name = {}
    for name, ref in pil["references"].items():
        if ref["type"] != "cmP":
            continue
        if ref.get("isArray"):
            for k in range(ref["len"]):
                id_to_name[ref["id"] + k] = f"{name}[{k}]"
        else:
            id_to_name[ref["id"]] = name
    out: Dict[int, int] = {}
    for pub in pil.get("publics", []):
        base = pub["name"].rstrip("0123456789")
        key = _PUBLIC_INPUT_KEYS.get(base)
        if key is None or key not in input_data:
            continue
        scalar = int(str(input_data[key]), 0) \
            if isinstance(input_data[key], str) else int(input_data[key])
        col = id_to_name.get(pub["polId"], "")
        m = re.search(r"(\d+)$", col)
        if base in ("oldBatchNum", "chainId", "forkId", "newBatchNum"):
            out[pub["id"]] = scalar % P
        elif m:
            limb = int(m.group(1))
            out[pub["id"]] = (scalar >> (32 * limb)) & 0xFFFFFFFF
    return out


def executor_cm_columns(res, air=None, strict: bool = True
                        ) -> Dict[str, np.ndarray]:
    """Map an ExecuteResult's sm_pols onto PIL column names.  With an
    AIR, array-style names are resolved and unknown producer columns
    raise (see resolve_columns)."""
    raw: Dict[str, np.ndarray] = {}
    for sm, ns in _SM_NAMESPACES:
        for name, col in res.sm_pols.get(sm, {}).items():
            raw[f"{ns}.{name}"] = col
    if air is None:
        return raw
    return resolve_columns(raw, air.cm_names, strict=strict)
