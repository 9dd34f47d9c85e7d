import numpy as np

from ikea_recommender_tpu.data.tokenizer import (
    PAD_TOKEN,
    Tokenizer,
    UNK_TOKEN,
    build_output_to_input_table,
)


def test_pad_is_last_unk_before():
    tok = Tokenizer(["a", "b", "c"], unknown=True, padding=True)
    assert tok.stoi("a") == 0
    assert tok.unk_idx == 3
    assert tok.pad_idx == 4  # <pad> is always LAST in vocab
    assert len(tok) == 5
    assert tok.itos(4) == PAD_TOKEN
    assert tok.itos(3) == UNK_TOKEN
    assert tok.stoi("zzz") == tok.unk_idx  # unk fallback


def test_no_unk_raises():
    tok = Tokenizer(["a"], unknown=False)
    try:
        tok.stoi("missing")
        assert False
    except KeyError:
        pass


def test_roundtrip(tmp_path):
    tok = Tokenizer(["x", "y"], unknown=True)
    path = str(tmp_path / "tok.json")
    tok.save_to_file(path)
    tok2 = Tokenizer.from_file(path)
    assert tok2.stoi_ == tok.stoi_
    assert tok2.itos_ == tok.itos_
    assert tok2.pad_idx == tok.pad_idx
    assert tok2.unk_idx == tok.unk_idx


def test_extend_contiguous():
    tok = Tokenizer(["a", "b"], padding=False)
    tok.extend(["c", "d"])
    assert tok.stoi("c") == 2 and tok.stoi("d") == 3
    assert tok.itos(3) == "d"


def test_output_to_input_table():
    inp = Tokenizer(["p1", "p2", "img1", "img2"], unknown=True)  # full vocab
    out = Tokenizer(["img1", "img2"], unknown=True)  # inspiration-only vocab
    table = build_output_to_input_table(inp, out)
    # out idx 0 = img1 -> input idx 2, out idx 1 = img2 -> input idx 3
    assert table[0] == 2 and table[1] == 3
    # <unk>/<pad> map onto the input tokenizer's own special ids
    assert table[out.unk_idx] == inp.unk_idx
    assert table[out.pad_idx] == inp.pad_idx
    ids = np.array([[1, 0], [0, 1]])
    np.testing.assert_array_equal(table[ids], [[3, 2], [2, 3]])


def test_encode():
    tok = Tokenizer(["a", "b"], unknown=True)
    np.testing.assert_array_equal(tok.encode(["b", "zz", "a"]), [1, 2, 0])
