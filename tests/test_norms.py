"""byte315 norm encoding vs hand-derived values (SmallFloat.cs:93-121 semantics)."""

import numpy as np

from lucene_net_ray.functions.norms import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    encode_norm_array,
    float_to_byte315,
    length_bucket_table,
)


def test_byte315_round_trip_monotone():
    prev = -1.0
    for b in range(1, 256):
        f = byte315_to_float(b)
        assert f > prev
        prev = f
        # decode(encode(f)) == f for exactly representable small floats
        assert float_to_byte315(f) == b


def test_reference_anchor_values():
    # TestSmallFloat-style anchors: epsilon region and identity points
    assert float_to_byte315(0.0) == 0
    assert float_to_byte315(-1.0) == 0
    assert float_to_byte315(5.8e-10) == 1  # tiny positive -> 1
    assert float_to_byte315(1.0) == 124
    assert byte315_to_float(124) == 1.0
    assert float_to_byte315(1.0e11) == 255  # overflow -> 255


def test_encode_norm_quantization_collapse():
    # FIXTURES.md: lengths 250 and 255 collapse to the same byte; 256 differs
    assert encode_norm(250) == encode_norm(255)  # same byte (lossy collapse)
    assert encode_norm(100) != encode_norm(250)
    assert encode_norm(255) != encode_norm(1000)
    # norm decodes to approximately the field length
    for n in [1, 2, 3, 7, 8, 9, 100, 250, 255, 256, 1000, 5000]:
        b = encode_norm(n)
        approx = NORM_TABLE[b]
        assert 0.5 * n <= approx <= 2.0 * n


def test_encode_norm_array_matches_scalar():
    lens = np.arange(0, 5000)
    vec = encode_norm_array(lens)
    for n in range(0, 5000, 97):
        assert vec[n] == encode_norm(n), n
    assert vec[0] == 255  # length 0 -> 1/sqrt(0)=inf -> byte 255


def test_length_bucket_table_agrees_with_encoder():
    table = length_bucket_table(100_000)
    # covers the range contiguously
    assert table[0][0] == 1
    for (lo, hi, b), (lo2, _, _) in zip(table, table[1:]):
        assert lo2 == hi + 1
    for lo, hi, b in table:
        assert encode_norm(lo) == b
        assert encode_norm(hi) == b
