"""Final-stage R1CS: the BN254-committed STARK verifier over BN254.

Native equivalent of the reference's `recursivefinal` circom circuit
(reference src/starkpil/recursivefinal/, prover.cpp:854-876): an R1CS over
BN254 Fr whose satisfaction implies a recursiveF-style proof
(stark/prover_bn128.py) verifies.  Groth16 over this R1CS is the
constant-size final proof (reference groth16.c.hpp flow).

Design:
  * linear combinations are free (R1CS A/B/C rows are LCs) — a `Lin` is a
    {signal: coef} dict; only multiplications allocate constraints;
  * Poseidon-BN254 (t=17, circomlib optimized form) costs 2 constraints
    per sbox; all mixes are free LCs;
  * Goldilocks arithmetic is emulated in Fr with lazy reduction: values
    carry magnitude bounds; a canonical reduction (witness quotient +
    64-bit range + canonicity check, the in-circuit mod-p) happens only
    when bounds approach Fr or an equality/bit-decomposition needs
    canonical form.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from ..ops.bn254_field import R_MOD
from ..ops.goldilocks import P as GLP, SHIFT, w as gl_w, w_inv as gl_w_inv
from ..ops.poseidon_bn254_constants import C as PC, M as PM, N_ROUNDS_F, \
    N_ROUNDS_P, P as PP, S as PS, T as PT
from ..stark.compiler import StarkInfo
from ..stark.merkle_bn128 import ARITY
from ..stark.proof import StarkProof

Lin = Dict[int, int]  # signal -> coefficient (signal 0 == constant 1)

# keep intermediate magnitudes at least a factor 2^60 below Fr
_MAX_BOUND = R_MOD >> 60


class R1CSBuilder:
    def __init__(self):
        self.values: List[int] = [1]  # signal 0 = 1
        self.n_public = 0             # publics are signals 1..n_public
        self.a: List[Lin] = []
        self.b: List[Lin] = []
        self.c: List[Lin] = []

    # -- signals ------------------------------------------------------
    def sig(self, v: int) -> int:
        self.values.append(v % R_MOD)
        return len(self.values) - 1

    def public(self, v: int) -> Lin:
        assert len(self.values) == self.n_public + 1, \
            "publics must be allocated before any witness"
        s = self.sig(v)
        self.n_public += 1
        return {s: 1}

    def witness(self, v: int) -> Lin:
        return {self.sig(v): 1}

    def const(self, v: int) -> Lin:
        return {0: v % R_MOD}

    # -- linear ops (free) --------------------------------------------
    @staticmethod
    def lc_add(a: Lin, b: Lin) -> Lin:
        out = dict(a)
        for s, c in b.items():
            out[s] = (out.get(s, 0) + c) % R_MOD
        return {s: c for s, c in out.items() if c}

    @staticmethod
    def lc_scale(a: Lin, k: int) -> Lin:
        k %= R_MOD
        return {s: (c * k) % R_MOD for s, c in a.items()} if k else {}

    def lc_sub(self, a: Lin, b: Lin) -> Lin:
        return self.lc_add(a, self.lc_scale(b, R_MOD - 1))

    def lc_value(self, a: Lin) -> int:
        return sum(self.values[s] * c for s, c in a.items()) % R_MOD

    # -- constraints ---------------------------------------------------
    def enforce(self, a: Lin, b: Lin, c: Lin) -> None:
        av, bv, cv = self.lc_value(a), self.lc_value(b), self.lc_value(c)
        assert av * bv % R_MOD == cv, "R1CS constraint fails on witness"
        self.a.append(dict(a))
        self.b.append(dict(b))
        self.c.append(dict(c))

    def mul(self, a: Lin, b: Lin) -> Lin:
        out = self.witness(self.lc_value(a) * self.lc_value(b) % R_MOD)
        self.enforce(a, b, out)
        return out

    def assert_eq(self, a: Lin, b: Lin) -> None:
        self.enforce(self.lc_sub(a, b), {0: 1}, {})

    def assert_bool(self, a: Lin) -> None:
        self.enforce(a, self.lc_sub(a, {0: 1}), {})

    def bit(self, v: int) -> Lin:
        w = self.witness(v)
        self.assert_bool(w)
        return w

    def select(self, bit: Lin, x: Lin, y: Lin) -> Lin:
        """bit ? x : y."""
        return self.lc_add(y, self.mul(bit, self.lc_sub(x, y)))

    def is_zero(self, a: Lin) -> Lin:
        v = self.lc_value(a)
        z = self.bit(1 if v == 0 else 0)
        iv = self.witness(0 if v == 0 else pow(v, R_MOD - 2, R_MOD))
        # a * iv = 1 - z ; a * z = 0
        self.enforce(a, iv, self.lc_sub({0: 1}, z))
        self.enforce(a, z, {})
        return z

    def decompose(self, a: Lin, n_bits: int) -> List[Lin]:
        v = self.lc_value(a)
        assert v < (1 << n_bits), "value exceeds decomposition width"
        bits = [self.bit((v >> i) & 1) for i in range(n_bits)]
        acc: Lin = {}
        for i, b in enumerate(bits):
            acc = self.lc_add(acc, self.lc_scale(b, 1 << i))
        self.assert_eq(acc, a)
        return bits

    def assert_lt_const(self, bits: List[Lin], bound: int) -> None:
        """Σ bits*2^i < bound, bits boolean-constrained, bound const.

        Standard MSB-first comparison: ok = OR over positions where
        bound's bit is 1 and all higher bits match."""
        n = len(bits)
        eq_prefix: Lin = {0: 1}  # all higher bits equal so far
        lt_any: Lin = {}
        for i in reversed(range(n)):
            bbit = (bound >> i) & 1
            if bbit:
                # value bit 0 here while prefix equal => strictly less
                contrib = self.mul(eq_prefix, self.lc_sub({0: 1}, bits[i]))
                lt_any = self.lc_add(lt_any, contrib)
                eq_prefix = self.mul(eq_prefix, bits[i])
            else:
                # value bit must be 0 to stay equal
                eq_prefix = self.mul(eq_prefix, self.lc_sub({0: 1}, bits[i]))
        self.assert_eq(lt_any, {0: 1})

    def to_r1cs(self):
        from ..snark.setup import R1CS

        return R1CS(n_vars=len(self.values), n_public=self.n_public,
                    a=self.a, b=self.b, c=self.c), list(self.values)


# ---------------------------------------------------------------------------
# Goldilocks emulation
# ---------------------------------------------------------------------------


@dataclass
class GLW:
    """A Goldilocks value embedded in Fr: integer value < bound."""

    lin: Lin
    bound: int  # exclusive upper bound on the integer value


def _canon_bits(r: R1CSBuilder, a: GLW) -> Tuple[GLW, List[Lin]]:
    """Reduce to canonical (< p) and return the 64 bits."""
    v = r.lc_value(a.lin)
    q, rem = divmod(v, GLP)
    q_lin = r.witness(q)
    rem_lin = r.witness(rem)
    # a = q*p + rem
    r.assert_eq(a.lin, r.lc_add(r.lc_scale(q_lin, GLP), rem_lin))
    q_bits_needed = max((a.bound // GLP).bit_length(), 1)
    r.decompose(q_lin, q_bits_needed)
    bits = r.decompose(rem_lin, 64)
    # canonicity: rem < p  <=>  not(hi32 all ones and lo32 != 0)
    hi_all: Lin = {0: 1}
    for b in bits[32:]:
        hi_all = r.mul(hi_all, b)
    lo: Lin = {}
    for i, b in enumerate(bits[:32]):
        lo = r.lc_add(lo, r.lc_scale(b, 1 << i))
    lo_zero = r.is_zero(lo)
    r.enforce(hi_all, r.lc_sub({0: 1}, lo_zero), {})
    return GLW(rem_lin, GLP), bits


def gl_reduce(r: R1CSBuilder, a: GLW) -> GLW:
    if a.bound <= GLP:
        return a
    out, _ = _canon_bits(r, a)
    return out


def gl_add(r: R1CSBuilder, a: GLW, b: GLW) -> GLW:
    out = GLW(r.lc_add(a.lin, b.lin), a.bound + b.bound)
    if out.bound > _MAX_BOUND:
        out = gl_reduce(r, out)
    return out


def gl_sub(r: R1CSBuilder, a: GLW, b: GLW) -> GLW:
    # add k*p so the result stays non-negative
    k = -(-b.bound // GLP)
    lin = r.lc_add(a.lin, r.lc_add(r.const(k * GLP),
                                   r.lc_scale(b.lin, R_MOD - 1)))
    out = GLW(lin, a.bound + k * GLP)
    if out.bound > _MAX_BOUND:
        out = gl_reduce(r, out)
    return out


def gl_mul(r: R1CSBuilder, a: GLW, b: GLW) -> GLW:
    if a.bound * b.bound > _MAX_BOUND:
        if a.bound > b.bound:
            a = gl_reduce(r, a)
        if a.bound * b.bound > _MAX_BOUND:
            b = gl_reduce(r, b)
        if a.bound * b.bound > _MAX_BOUND:
            a = gl_reduce(r, a)
    return GLW(r.mul(a.lin, b.lin), a.bound * b.bound)


def gl_const(v: int) -> GLW:
    return GLW({0: v % GLP} if v % GLP else {}, (v % GLP) + 1)


def gl_assert_eq(r: R1CSBuilder, a: GLW, b: GLW) -> None:
    ar = gl_reduce(r, a)
    br = gl_reduce(r, b)
    if ar.bound > GLP or br.bound > GLP:
        raise AssertionError("unreduced")
    r.assert_eq(ar.lin, br.lin)


def gl_inv(r: R1CSBuilder, a: GLW) -> GLW:
    ar = gl_reduce(r, a)
    v = r.lc_value(ar.lin)
    assert v % GLP != 0
    iv = pow(v, GLP - 2, GLP)
    ivw = GLW(r.witness(iv), GLP)
    prod = gl_mul(r, ar, ivw)
    gl_assert_eq(r, prod, gl_const(1))
    return ivw


# GF(p^3): triples of GLW, x^3 = x + 1 (mirror stark/host_field.py)
G3 = Tuple[GLW, GLW, GLW]


def g3(r, a) -> G3:
    if isinstance(a, tuple):
        return a
    return (a, gl_const(0), gl_const(0))


def g3_add(r, a: G3, b: G3) -> G3:
    a, b = g3(r, a), g3(r, b)
    return tuple(gl_add(r, x, y) for x, y in zip(a, b))


def g3_sub(r, a: G3, b: G3) -> G3:
    a, b = g3(r, a), g3(r, b)
    return tuple(gl_sub(r, x, y) for x, y in zip(a, b))


def g3_mul(r, a: G3, b: G3) -> G3:
    a0, a1, a2 = g3(r, a)
    b0, b1, b2 = g3(r, b)
    d0 = gl_mul(r, a0, b0)
    d1 = gl_add(r, gl_mul(r, a0, b1), gl_mul(r, a1, b0))
    d2 = gl_add(r, gl_add(r, gl_mul(r, a0, b2), gl_mul(r, a1, b1)),
                gl_mul(r, a2, b0))
    d3 = gl_add(r, gl_mul(r, a1, b2), gl_mul(r, a2, b1))
    d4 = gl_mul(r, a2, b2)
    return (gl_add(r, d0, d3), gl_add(r, gl_add(r, d1, d3), d4),
            gl_add(r, d2, d4))


def g3_assert_eq(r, a: G3, b: G3) -> None:
    a, b = g3(r, a), g3(r, b)
    for x, y in zip(a, b):
        gl_assert_eq(r, x, y)


def g3_inv(r, a: G3) -> G3:
    from ..stark.host_field import inv3

    a = g3(r, a)
    av = tuple(r.lc_value(gl_reduce(r, x).lin) % GLP for x in a)
    iv = inv3(av)
    ivw = tuple(GLW(r.witness(x), GLP) for x in iv)
    g3_assert_eq(r, g3_mul(r, a, ivw), (gl_const(1), gl_const(0),
                                        gl_const(0)))
    return ivw


# ---------------------------------------------------------------------------
# Poseidon-BN254 t=17 in R1CS (circomlib optimized form; sboxes only cost)
# ---------------------------------------------------------------------------


def _p17_exp5(r: R1CSBuilder, x: Lin) -> Lin:
    x2 = r.mul(x, x)
    x4 = r.mul(x2, x2)
    return r.mul(x4, x)


def poseidon_t(r: R1CSBuilder, state: List[Lin]) -> List[Lin]:
    """In-R1CS Poseidon for any width 2..17 (optimized circomlib form).
    The BN128 linear hash runs its final partial chunk at t = pending+1
    (reference merkleTreeBN128.cpp:130-136), so the in-circuit hash must
    dispatch on the state width exactly like ops/poseidon_bn254.permute_t."""
    t = len(state)
    if t == PT:
        c, s, m, p, n_rounds_p = PC, PS, PM, PP, N_ROUNDS_P
    else:
        from ..ops.poseidon_bn254 import _all_t_tables

        c, s, m, p, n_rounds_p = _all_t_tables()[t]
    st = [r.lc_add(state[i], r.const(c[i])) for i in range(t)]
    half_f = N_ROUNDS_F // 2

    def mix(vals, mat):
        out = []
        for i in range(t):
            acc: Lin = {}
            for j in range(t):
                acc = r.lc_add(acc, r.lc_scale(vals[j], mat[j][i]))
            out.append(acc)
        return out

    for rr in range(half_f - 1):
        st = [_p17_exp5(r, x) for x in st]
        st = [r.lc_add(st[i], r.const(c[(rr + 1) * t + i]))
              for i in range(t)]
        st = mix(st, m)
    st = [_p17_exp5(r, x) for x in st]
    st = [r.lc_add(st[i], r.const(c[half_f * t + i])) for i in range(t)]
    st = mix(st, p)
    for rr in range(n_rounds_p):
        st0 = _p17_exp5(r, st[0])
        st0 = r.lc_add(st0, r.const(c[(half_f + 1) * t + rr]))
        base = (t * 2 - 1) * rr
        new0: Lin = r.lc_scale(st0, s[base])
        for j in range(1, t):
            new0 = r.lc_add(new0, r.lc_scale(st[j], s[base + j]))
        new = [new0]
        for k in range(1, t):
            new.append(r.lc_add(st[k],
                                r.lc_scale(st0, s[base + t + k - 1])))
        st = new
    for rr in range(half_f - 1):
        st = [_p17_exp5(r, x) for x in st]
        st = [
            r.lc_add(
                st[i],
                r.const(c[(half_f + 1) * t + n_rounds_p + rr * t + i]),
            )
            for i in range(t)
        ]
        st = mix(st, m)
    st = [_p17_exp5(r, x) for x in st]
    st = mix(st, m)
    return st


def poseidon17(r: R1CSBuilder, state: List[Lin]) -> List[Lin]:
    assert len(state) == PT
    return poseidon_t(r, state)


# ---------------------------------------------------------------------------
# In-R1CS Fr transcript (mirror of stark/merkle_bn128.TranscriptBN128)
# ---------------------------------------------------------------------------


class FTranscript:
    PENDING = 16

    def __init__(self, r: R1CSBuilder):
        self.r = r
        self.state: Lin = {}
        self.pending: List[Lin] = []
        self.out: List[Lin] = []

    def put(self, lins: Sequence[Lin]) -> None:
        for lin in lins:
            self.pending.append(lin)
            self.out = []
            if len(self.pending) == self.PENDING:
                self._squeeze()

    def _squeeze(self) -> None:
        st = [self.state] + self.pending + \
            [{} for _ in range(self.PENDING - len(self.pending))]
        outs = poseidon17(self.r, st)
        self.state = outs[0]
        self.pending = []
        self.out = list(outs)

    def get_field_fr(self) -> Lin:
        if not self.out:
            self._squeeze()
        return self.out.pop(0)

    def _fr_bits(self) -> List[Lin]:
        fr = self.get_field_fr()
        bits = self.r.decompose(fr, 254)
        self.r.assert_lt_const(bits, R_MOD)
        return bits

    def get_field_gl3(self) -> G3:
        bits = self._fr_bits()
        out = []
        for i in range(3):
            lin: Lin = {}
            for j in range(64):
                lin = self.r.lc_add(lin, self.r.lc_scale(bits[64 * i + j],
                                                         1 << j))
            out.append(GLW(lin, 1 << 64))
        return tuple(out)

    def get_permutation_bits(self, n: int, n_bits: int) -> List[List[Lin]]:
        """Mirror of TranscriptBN128.get_permutations over bit wires:
        ceil(n*n_bits/253) fields drawn up front, indices taken LSB-first
        with bit-level continuation across field boundaries (reference
        transcriptBN128.cpp:95-131)."""
        total = n * n_bits
        n_fields = (total - 1) // 253 + 1
        stream: List[Lin] = []
        for _ in range(n_fields):
            stream.extend(self._fr_bits()[:253])
        return [stream[i * n_bits:(i + 1) * n_bits] for i in range(n)]


# ---------------------------------------------------------------------------
# gadgets
# ---------------------------------------------------------------------------


def select_many_lin(r: R1CSBuilder, bits: List[Lin], items: List[Lin]) -> Lin:
    assert len(items) == 1 << len(bits)
    layer = list(items)
    for b in bits:
        layer = [r.select(b, layer[i + 1], layer[i])
                 for i in range(0, len(layer), 2)]
    return layer[0]


def select_many_g3(r: R1CSBuilder, bits: List[Lin], items: List[G3]) -> G3:
    comps = []
    for k in range(3):
        comps.append(select_many_lin(r, bits,
                                     [gl_reduce(r, it[k]).lin for it in items]))
    return tuple(GLW(c, GLP) for c in comps)


def gl_pow_bits(r: R1CSBuilder, base: int, bits: List[Lin]) -> GLW:
    acc = gl_const(1)
    cur = base % GLP
    for b in bits:
        term = GLW(r.lc_add({0: 1}, r.lc_scale(b, cur - 1)), cur + 1)
        acc = gl_mul(r, acc, term)
        cur = cur * cur % GLP
    return acc


def witness_gl(r: R1CSBuilder, v: int) -> GLW:
    """Witness a Goldilocks value with a 64-bit range check (the bound is
    what makes the lazy-reduction arithmetic sound)."""
    lin = r.witness(int(v))
    r.decompose(lin, 64)
    return GLW(lin, 1 << 64)


def witness_g3(r: R1CSBuilder, vals) -> G3:
    return tuple(witness_gl(r, int(v)) for v in vals)


def pack_rows_lin(r: R1CSBuilder, felts: List[GLW]) -> List[Lin]:
    """3 GL felts per Fr element (stark/merkle_bn128.pack_row); felts must
    be 64-bit-bounded wires."""
    out = []
    for off in range(0, len(felts), 3):
        chunk = felts[off: off + 3]
        lin: Lin = {}
        for i, f in enumerate(chunk):
            assert f.bound <= 1 << 64
            lin = r.lc_add(lin, r.lc_scale(f.lin, 1 << (64 * i)))
        out.append(lin)
    return out


def linear_hash_lin(r: R1CSBuilder, packed: List[Lin]) -> Lin:
    """Mirror of ops/poseidon_bn254.linear_hash: 16-wide chunks with
    capacity chaining; the final partial chunk at t = pending+1."""
    acc: Lin = {}
    if not packed:
        return poseidon17(r, [{} for _ in range(PT)])[0]
    for off in range(0, len(packed), 16):
        chunk = packed[off: off + 16]
        acc = poseidon_t(r, [acc] + chunk)[0]
    return acc


def leaf_hash_lin(r: R1CSBuilder, felts: List[GLW]) -> Lin:
    """Mirror of stark/merkle_bn128.leaf_hash: rows of width <= 4 are one
    packed Fr element (4 felts per 64-bit limb, no hash); wider rows pack
    3-per-Fr and sponge-hash."""
    if len(felts) <= 4:
        lin: Lin = {}
        for i, f in enumerate(felts):
            assert f.bound <= 1 << 64
            lin = r.lc_add(lin, r.lc_scale(f.lin, 1 << (64 * i)))
        return lin
    return linear_hash_lin(r, pack_rows_lin(r, felts))


def merkle_verify_r1(r: R1CSBuilder, root: Lin, felts: List[GLW],
                     path_bits: List[Lin], groups: List[List[Lin]]) -> None:
    h = leaf_hash_lin(r, felts)
    pos = 0
    for group in groups:
        nb = min(4, len(path_bits) - pos)
        gb = path_bits[pos: pos + nb] + [{} for _ in range(4 - nb)]
        # our child in the group must equal the running digest
        sel = select_many_lin(r, gb, group)
        r.assert_eq(sel, h)
        h = poseidon17(r, [{}] + group)[0]
        pos += 4
    r.assert_eq(h, root)


def eval_expr_r1(r: R1CSBuilder, e, env: Dict, memo: Dict) -> G3:
    hit = memo.get(e)
    if hit is not None:
        return hit
    k = e.kind
    if k in ("cm", "const", "q"):
        v = g3(r, env[(k, e.id, e.prime)])
    elif k in ("challenge", "public", "eval"):
        v = g3(r, env[(k, e.id)])
    elif k == "number":
        v = g3(r, gl_const(e.value))
    elif k in ("x", "Zi", "xDivXSubXi", "xDivXSubWXi"):
        v = g3(r, env[k])
    elif k == "add":
        v = g3_add(r, eval_expr_r1(r, e.args[0], env, memo),
                   eval_expr_r1(r, e.args[1], env, memo))
    elif k == "sub":
        v = g3_sub(r, eval_expr_r1(r, e.args[0], env, memo),
                   eval_expr_r1(r, e.args[1], env, memo))
    elif k == "mul":
        v = g3_mul(r, eval_expr_r1(r, e.args[0], env, memo),
                   eval_expr_r1(r, e.args[1], env, memo))
    elif k == "neg":
        v = g3_sub(r, g3(r, gl_const(0)), eval_expr_r1(r, e.args[0], env, memo))
    else:
        raise ValueError(f"unsupported expr kind {k}")
    memo[e] = v
    return v


# ---------------------------------------------------------------------------
# the final verifier statement
# ---------------------------------------------------------------------------


def build_final_r1cs(info: StarkInfo, const_root: int, proof: StarkProof,
                     publics: Optional[List[int]] = None):
    """R1CS whose satisfaction verifies a BN254-committed STARK proof
    (stark/prover_bn128.StarkProverBN128).

    SNARK publics: [inner publics (GL) ..., const_root (Fr)].
    Returns (R1CS, witness values).  Mirrors stark/verifier.verify with the
    BN128 tree/transcript.
    """
    from .verifier_circuit import intt_const_rows

    if publics is None:
        publics = proof.publics
    r = R1CSBuilder()
    pub_lins = [r.public(int(v)) for v in publics]
    root_lin = r.public(int(const_root))
    pub_glw = [GLW(lin, GLP) for lin in pub_lins]

    n_bits = info.n_bits

    # ---- ingest proof ----
    roots = [r.witness(int(rt[0])) for rt in proof.roots]
    evals = [witness_g3(r, e) for e in proof.evals]
    fri_roots = [r.witness(int(rt[0])) for rt in proof.fri_roots]
    final_pol = [witness_g3(r, e) for e in proof.final_pol]

    # ---- transcript ----
    t = FTranscript(r)
    t.put(pub_lins)
    ch: List[Optional[G3]] = [None] * 8
    t.put([roots[0]])
    ch[0] = t.get_field_gl3()
    ch[1] = t.get_field_gl3()
    t.put([roots[1]])
    ch[2] = t.get_field_gl3()
    ch[3] = t.get_field_gl3()
    t.put([roots[2]])
    ch[4] = t.get_field_gl3()
    t.put([roots[3]])
    ch[7] = t.get_field_gl3()
    for e3 in evals:
        t.put([x.lin for x in e3])
    ch[5] = t.get_field_gl3()
    ch[6] = t.get_field_gl3()

    n_steps = len(info.fri_step_bits)
    assert len(proof.fri_roots) == n_steps - 1
    special_xs: List[G3] = []
    for si in range(n_steps):
        special_xs.append(t.get_field_gl3())
        if si < n_steps - 1:
            t.put([fri_roots[si]])
        else:
            assert len(final_pol) == 1 << info.fri_step_bits[-1]
            for e3 in final_pol:
                t.put([x.lin for x in e3])
    ys_bits = t.get_permutation_bits(info.n_queries, info.fri_step_bits[0])

    xi = ch[7]

    # ---- DEEP identity at xi ----
    env: Dict = {}
    for k, (kind, pid, prime) in enumerate(info.ev_map):
        env[(kind, pid, prime)] = evals[k]
        env[("eval", k)] = evals[k]
    for i, c3 in enumerate(ch):
        env[("challenge", i)] = c3
    for i, pw in enumerate(pub_glw):
        env[("public", i)] = g3(r, pw)
    xi_n = xi
    for _ in range(n_bits):
        xi_n = g3_mul(r, xi_n, xi_n)
    zh = g3_sub(r, xi_n, g3(r, gl_const(1)))
    env["x"] = xi
    env["Zi"] = g3_inv(r, zh)

    memo: Dict = {}
    c_val = eval_expr_r1(r, info.c_exp, env, memo)
    q_val = g3(r, gl_const(0))
    for p_i in reversed(range(info.q_deg)):
        k = info.ev_map.index(("q", p_i, False))
        q_val = g3_add(r, g3_mul(r, q_val, xi_n), evals[k])
    g3_assert_eq(r, g3_mul(r, q_val, zh), c_val)

    # ---- per-query checks ----
    sec2tree = {"cm1_n": "cm1", "cm2_n": "cm2", "cm3_n": "cm3",
                "cm4_2ns": "cm4"}
    tree_roots = {"cm1": roots[0], "cm2": roots[1], "cm3": roots[2],
                  "cm4": roots[3], "const": root_lin}
    w_ext = gl_w(info.n_bits_ext)
    w_n = gl_w(n_bits)
    wxi = g3_mul(r, xi, g3(r, gl_const(w_n)))

    for qi in range(info.n_queries):
        y_bits = ys_bits[qi]
        openings = proof.queries_step0[qi]
        op_wires: Dict[str, List[GLW]] = {}
        for name, root in tree_roots.items():
            op = openings[name]
            felts = [witness_gl(r, v) for v in op.values]
            groups = [[r.witness(int(v)) for v in grp]
                      for grp in op.siblings]
            merkle_verify_r1(r, root, felts, y_bits, groups)
            op_wires[name] = felts

        x_y = gl_mul(r, gl_pow_bits(r, w_ext, y_bits), gl_const(SHIFT))
        qenv: Dict = dict(env)
        qenv["x"] = g3(r, x_y)
        for k, (kind, pid, prime) in enumerate(info.ev_map):
            if kind == "const":
                qenv[("const", pid, False)] = g3(r, op_wires["const"][pid])
                continue
            cm_id = info.qs[pid] if kind == "q" else pid
            pm = info.cm_pols[cm_id]
            vals = op_wires[sec2tree[pm.section]]
            pos = pm.section_pos
            if pm.dim == 1:
                qenv[(kind, pid, False)] = g3(r, vals[pos])
            else:
                qenv[(kind, pid, False)] = (vals[pos], vals[pos + 1],
                                            vals[pos + 2])
        x3 = g3(r, x_y)
        qenv["xDivXSubXi"] = g3_mul(r, x3, g3_inv(r, g3_sub(r, x3, xi)))
        qenv["xDivXSubWXi"] = g3_mul(r, x3, g3_inv(r, g3_sub(r, x3, wxi)))

        qmemo: Dict = {}
        cur_val = eval_expr_r1(r, info.fri_exp, qenv, qmemo)

        cur_bits = y_bits
        shift_inv_cur = pow(SHIFT, GLP - 2, GLP)
        pol_bits = info.fri_step_bits[0]
        for si in range(1, n_steps):
            bits = info.fri_step_bits[si]
            y_next_bits = cur_bits[:bits]
            j_bits = cur_bits[bits:]
            gsz = 1 << (pol_bits - bits)
            opening = proof.queries_fri[si - 1][qi]
            felts = [witness_gl(r, v) for v in opening.values]
            groups = [[r.witness(int(v)) for v in grp]
                      for grp in opening.siblings]
            merkle_verify_r1(r, fri_roots[si - 1], felts, y_next_bits, groups)
            group: List[G3] = [
                (felts[3 * g], felts[3 * g + 1], felts[3 * g + 2])
                for g in range(gsz)
            ]
            sel = select_many_g3(r, j_bits, group)
            g3_assert_eq(r, sel, cur_val)

            rows_m = intt_const_rows(gsz)
            coeffs: List[G3] = []
            for i in range(gsz):
                comp = []
                for cidx in range(3):
                    lin: Lin = {}
                    bound = 1
                    for jj in range(gsz):
                        lin = r.lc_add(lin, r.lc_scale(group[jj][cidx].lin,
                                                       rows_m[i][jj]))
                        bound += group[jj][cidx].bound * rows_m[i][jj]
                    comp.append(GLW(lin, bound))
                coeffs.append(tuple(comp))
            wy = gl_const(1)
            for i, b in enumerate(y_next_bits):
                c = pow(gl_w(pol_bits), (GLP - 1 - (1 << i)) % (GLP - 1), GLP)
                term = GLW(r.lc_add({0: 1}, r.lc_scale(b, c - 1)), c + 1)
                wy = gl_mul(r, wy, term)
            sinv_g = gl_mul(r, wy, gl_const(shift_inv_cur))
            scale = tuple(gl_mul(r, x, sinv_g) for x in special_xs[si])
            acc = g3(r, gl_const(0))
            for coef in reversed(coeffs):
                acc = g3_add(r, g3_mul(r, acc, scale), coef)
            cur_val = acc
            for _ in range(pol_bits - bits):
                shift_inv_cur = shift_inv_cur * shift_inv_cur % GLP
            pol_bits = bits
            cur_bits = y_next_bits

        fsel = select_many_g3(r, cur_bits, final_pol)
        g3_assert_eq(r, cur_val, fsel)

    # ---- final polynomial degree bound ----
    m = len(final_pol)
    rows_m = intt_const_rows(m)
    max_deg = 1 << (info.fri_step_bits[-1] - info.blowup_bits)
    for d in range(max_deg, m):
        for cidx in range(3):
            lin: Lin = {}
            bound = 1
            for jj in range(m):
                lin = r.lc_add(lin, r.lc_scale(final_pol[jj][cidx].lin,
                                               rows_m[d][jj]))
                bound += final_pol[jj][cidx].bound * rows_m[d][jj]
            gl_assert_eq(r, GLW(lin, bound), gl_const(0))

    return r.to_r1cs()
