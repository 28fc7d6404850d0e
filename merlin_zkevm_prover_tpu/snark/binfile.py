"""snarkjs binfile container + zkey / wtns readers and writers.

Reference: src/rapidsnark/binfile_utils.{hpp,cpp} and zkey_utils.cpp.
Format: magic(4) version(u32) nSections(u32), then sections of
id(u32) + size(u64) + payload.  Field elements are little-endian
Montgomery form; G1 = (x, y), G2 = ((x0, x1), (y0, y1)).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from io import BytesIO
from typing import Dict, List, Optional, Tuple

from ..ops.bn254_field import Q, R_MOD

R256 = 1 << 256
_R_Q = R256 % Q
_R_R = R256 % R_MOD
_RINV_Q = pow(_R_Q, -1, Q)
_RINV_R = pow(_R_R, -1, R_MOD)


class BinFile:
    def __init__(self, data: bytes):
        self.data = data
        magic, version, n_sections = struct.unpack_from("<4sII", data, 0)
        self.magic = magic
        self.version = version
        self.sections: Dict[int, List[Tuple[int, int]]] = {}
        pos = 12
        for _ in range(n_sections):
            sid, size = struct.unpack_from("<IQ", data, pos)
            pos += 12
            self.sections.setdefault(sid, []).append((pos, size))
            pos += size

    def section(self, sid: int) -> bytes:
        pos, size = self.sections[sid][0]
        return self.data[pos:pos + size]


class BinFileWriter:
    def __init__(self, magic: bytes, version: int = 1):
        self.magic = magic
        self.version = version
        self.sections: List[Tuple[int, bytes]] = []

    def add(self, sid: int, payload: bytes):
        self.sections.append((sid, payload))

    def tobytes(self) -> bytes:
        out = BytesIO()
        out.write(struct.pack("<4sII", self.magic, self.version,
                              len(self.sections)))
        for sid, payload in self.sections:
            out.write(struct.pack("<IQ", sid, len(payload)))
            out.write(payload)
        return out.getvalue()


# -- Montgomery field element I/O --

def fq_read(b: bytes) -> int:
    return (int.from_bytes(b, "little") * _RINV_Q) % Q


def fq_write(v: int) -> bytes:
    return ((v * _R_Q) % Q).to_bytes(32, "little")


def fr_read(b: bytes) -> int:
    return (int.from_bytes(b, "little") * _RINV_R) % R_MOD


def fr_write(v: int) -> bytes:
    return ((v * _R_R) % R_MOD).to_bytes(32, "little")


def g1_read(b: bytes) -> Tuple[int, int]:
    return fq_read(b[0:32]), fq_read(b[32:64])


def g1_write(p: Tuple[int, int]) -> bytes:
    return fq_write(p[0]) + fq_write(p[1])


def g2_read(b: bytes) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    return ((fq_read(b[0:32]), fq_read(b[32:64])),
            (fq_read(b[64:96]), fq_read(b[96:128])))


def g2_write(p) -> bytes:
    return (fq_write(p[0][0]) + fq_write(p[0][1]) +
            fq_write(p[1][0]) + fq_write(p[1][1]))


# ---------------------------------------------------------------------------
# zkey
# ---------------------------------------------------------------------------

GROTH16_PROTOCOL_ID = 1


@dataclass
class ZKeyData:
    n_vars: int
    n_public: int
    domain_size: int
    alpha1: Tuple[int, int]
    beta1: Tuple[int, int]
    delta1: Tuple[int, int]
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    ic: List[Tuple[int, int]] = field(default_factory=list)
    coefs: List[Tuple[int, int, int, int]] = field(default_factory=list)
    points_a: List[Tuple[int, int]] = field(default_factory=list)
    points_b1: List[Tuple[int, int]] = field(default_factory=list)
    points_b2: List[tuple] = field(default_factory=list)
    points_c: List[Tuple[int, int]] = field(default_factory=list)
    points_h: List[Tuple[int, int]] = field(default_factory=list)


def load_zkey(source) -> ZKeyData:
    """source: path or bytes in the snarkjs .zkey (groth16) format."""
    data = open(source, "rb").read() if isinstance(source, str) else source
    bf = BinFile(data)
    assert bf.magic == b"zkey", bf.magic
    proto = struct.unpack("<I", bf.section(1)[:4])[0]
    assert proto == GROTH16_PROTOCOL_ID, f"unsupported protocol {proto}"

    hdr = bf.section(2)
    pos = 0
    n8q = struct.unpack_from("<I", hdr, pos)[0]
    pos += 4
    q = int.from_bytes(hdr[pos:pos + n8q], "little")
    pos += n8q
    assert q == Q, "not a bn128 zkey"
    n8r = struct.unpack_from("<I", hdr, pos)[0]
    pos += 4
    r = int.from_bytes(hdr[pos:pos + n8r], "little")
    pos += n8r
    assert r == R_MOD
    n_vars, n_public, domain_size = struct.unpack_from("<III", hdr, pos)
    pos += 12
    alpha1 = g1_read(hdr[pos:pos + 64]); pos += 64
    beta1 = g1_read(hdr[pos:pos + 64]); pos += 64
    beta2 = g2_read(hdr[pos:pos + 128]); pos += 128
    gamma2 = g2_read(hdr[pos:pos + 128]); pos += 128
    delta1 = g1_read(hdr[pos:pos + 64]); pos += 64
    delta2 = g2_read(hdr[pos:pos + 128]); pos += 128

    zk = ZKeyData(n_vars=n_vars, n_public=n_public,
                  domain_size=domain_size, alpha1=alpha1, beta1=beta1,
                  delta1=delta1, beta2=beta2, gamma2=gamma2, delta2=delta2)

    ic = bf.section(3)
    zk.ic = [g1_read(ic[i * 64:(i + 1) * 64])
             for i in range(len(ic) // 64)]

    co = bf.section(4)
    n_coefs = struct.unpack_from("<I", co, 0)[0]
    pos = 4
    for _ in range(n_coefs):
        m, c, s = struct.unpack_from("<III", co, pos)
        pos += 12
        v = fr_read(co[pos:pos + 32])
        pos += 32
        zk.coefs.append((m, c, s, v))

    def g1s(sid):
        b = bf.section(sid)
        return [g1_read(b[i * 64:(i + 1) * 64]) for i in range(len(b) // 64)]

    def g2s(sid):
        b = bf.section(sid)
        return [g2_read(b[i * 128:(i + 1) * 128])
                for i in range(len(b) // 128)]

    zk.points_a = g1s(5)
    zk.points_b1 = g1s(6)
    zk.points_b2 = g2s(7)
    zk.points_c = g1s(8)
    zk.points_h = g1s(9)
    return zk


def write_zkey(zk: ZKeyData) -> bytes:
    w = BinFileWriter(b"zkey")
    w.add(1, struct.pack("<I", GROTH16_PROTOCOL_ID))
    hdr = BytesIO()
    hdr.write(struct.pack("<I", 32))
    hdr.write(Q.to_bytes(32, "little"))
    hdr.write(struct.pack("<I", 32))
    hdr.write(R_MOD.to_bytes(32, "little"))
    hdr.write(struct.pack("<III", zk.n_vars, zk.n_public, zk.domain_size))
    hdr.write(g1_write(zk.alpha1))
    hdr.write(g1_write(zk.beta1))
    hdr.write(g2_write(zk.beta2))
    hdr.write(g2_write(zk.gamma2))
    hdr.write(g1_write(zk.delta1))
    hdr.write(g2_write(zk.delta2))
    w.add(2, hdr.getvalue())
    w.add(3, b"".join(g1_write(p) for p in zk.ic))
    co = BytesIO()
    co.write(struct.pack("<I", len(zk.coefs)))
    for (m, c, s, v) in zk.coefs:
        co.write(struct.pack("<III", m, c, s))
        co.write(fr_write(v))
    w.add(4, co.getvalue())
    w.add(5, b"".join(g1_write(p) for p in zk.points_a))
    w.add(6, b"".join(g1_write(p) for p in zk.points_b1))
    w.add(7, b"".join(g2_write(p) for p in zk.points_b2))
    w.add(8, b"".join(g1_write(p) for p in zk.points_c))
    w.add(9, b"".join(g1_write(p) for p in zk.points_h))
    return w.tobytes()


# ---------------------------------------------------------------------------
# wtns
# ---------------------------------------------------------------------------


def load_wtns(source) -> List[int]:
    data = open(source, "rb").read() if isinstance(source, str) else source
    bf = BinFile(data)
    assert bf.magic == b"wtns", bf.magic
    hdr = bf.section(1)
    n8 = struct.unpack_from("<I", hdr, 0)[0]
    r = int.from_bytes(hdr[4:4 + n8], "little")
    assert r == R_MOD
    n = struct.unpack_from("<I", hdr, 4 + n8)[0]
    vals = bf.section(2)
    return [int.from_bytes(vals[i * n8:(i + 1) * n8], "little")
            for i in range(n)]


def write_wtns(witness: List[int]) -> bytes:
    w = BinFileWriter(b"wtns", version=2)
    hdr = struct.pack("<I", 32) + R_MOD.to_bytes(32, "little") + \
        struct.pack("<I", len(witness))
    w.add(1, hdr)
    w.add(2, b"".join((v % R_MOD).to_bytes(32, "little") for v in witness))
    return w.tobytes()
