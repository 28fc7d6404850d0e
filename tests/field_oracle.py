"""Pure-python big-int oracle for Goldilocks / GF(p^3), used only by tests."""

P = (1 << 64) - (1 << 32) + 1


def gl3_mul(a, b):
    """(a0,a1,a2) x (b0,b1,b2) mod (x^3 - x - 1), python ints."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    d0 = a0 * b0
    d1 = a0 * b1 + a1 * b0
    d2 = a0 * b2 + a1 * b1 + a2 * b0
    d3 = a1 * b2 + a2 * b1
    d4 = a2 * b2
    # x^3 = x + 1, x^4 = x^2 + x
    c0 = (d0 + d3) % P
    c1 = (d1 + d3 + d4) % P
    c2 = (d2 + d4) % P
    return (c0, c1, c2)


def gl3_inv(a):
    # brute: extended exponentiation a^(p^3 - 2)
    e = P**3 - 2
    result = (1, 0, 0)
    base = a
    while e:
        if e & 1:
            result = gl3_mul(result, base)
        e >>= 1
        base = gl3_mul(base, base)
    return result
