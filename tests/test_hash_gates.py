"""SHA-256 / Blake2b-256 gate-script generators vs the hashlib oracles
(reference tools/sm/sha256/sha256_test.cpp, tools/sm/blake/blake_test.cpp
validate the same way against byte-level implementations)."""

import hashlib

import pytest

from merlin_zkevm_prover_tpu.executor.sm.hash_gate_scripts import (
    blake2b_256_gate,
    build_blake2b_compress_program,
    build_sha256_compress_program,
    sha256_gate,
)


@pytest.mark.parametrize("data", [
    b"", b"abc", b"a" * 55, b"b" * 56, b"c" * 64, b"d" * 200,
])
def test_sha256_gate_matches_hashlib(data):
    assert sha256_gate(data) == hashlib.sha256(data).digest()


@pytest.mark.parametrize("data", [
    b"", b"abc", b"x" * 128, b"y" * 129, b"z" * 300,
])
def test_blake2b_gate_matches_hashlib(data):
    assert blake2b_256_gate(data) == hashlib.blake2b(
        data, digest_size=32).digest()


def test_gate_counts_are_slot_scale():
    """The compression circuits land at the reference's slot scale
    (tools/sm gate configs size one slot per compression)."""
    sha = build_sha256_compress_program()
    blake = build_blake2b_compress_program()
    assert 20_000 < len(sha.gates) < 300_000
    assert 20_000 < len(blake.gates) < 400_000
