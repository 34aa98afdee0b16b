import numpy as np

from genome_assembly_tpu.core import encoding as enc


def test_roundtrip():
    s = "ACGTACGTTT"
    codes = enc.encode(s)
    assert codes.dtype == np.int8
    assert enc.decode(codes) == s


def test_batch_left_and_right_align():
    seqs = ["ACGT", "AC", "GGGGGG"]
    left, lens = enc.encode_batch(seqs, width=8, align="left")
    assert left.shape == (3, 8)
    assert list(lens) == [4, 2, 6]
    assert enc.decode(left[0], 4) == "ACGT"
    assert (left[1, 2:] == enc.PAD).all()

    right, lens2 = enc.encode_batch(seqs, width=8, align="right")
    assert (right[1, :6] == enc.PAD).all()
    assert enc.decode(right[1][6:]) == "AC"
    assert (lens == lens2).all()


def test_decode_batch():
    seqs = ["A", "ACGTACG"]
    mat, lens = enc.encode_batch(seqs, width=8)
    assert enc.decode_batch(mat, lens) == seqs
