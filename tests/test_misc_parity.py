"""Small-surface parity: sincos pos-embed, Collator, vocab, CER/WER,
pickle IO."""

import numpy as np
import jax.numpy as jnp
import torch

from odevit_tpu.ops.pos_embed import pos_emb_sincos_2d
from odevit_tpu.data.collator import Collator
from odevit_tpu.utils.text import (GenerationVocab, char_error_rate,
                                   edit_distance, word_error_rate)
from odevit_tpu.utils.io import (load_lyapunov_records,
                                 save_lyapunov_records, read_pickle,
                                 write_pickle)


def test_pos_emb_sincos_2d_matches_torch_oracle():
    h, w, dim = 3, 4, 16
    got = np.asarray(pos_emb_sincos_2d(h, w, dim))
    y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    omega = 1.0 / (10000 ** torch.arange(dim // 4, dtype=torch.float32))
    yv = y.flatten()[:, None] * omega[None]
    xv = x.flatten()[:, None] * omega[None]
    want = torch.cat([xv.sin(), xv.cos(), yv.sin(), yv.cos()], 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_collator_without_processor():
    from PIL import Image
    batch = [(Image.new("RGB", (20, 30), (255, 0, 0)), 3),
             (Image.new("RGB", (10, 10), (0, 255, 0)), 1)]
    out = Collator(image_size=16).classification_collate_fn(batch)
    assert out["pixel_values"].shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(out["labels"], [3, 1])
    assert len(out["raw_images"]) == 2


def test_collator_with_hf_processor():
    from transformers import ViTImageProcessor
    proc = ViTImageProcessor(size={"height": 8, "width": 8})
    from PIL import Image
    batch = [(Image.new("RGB", (20, 20)), 0)]
    out = Collator(proc).classification_collate_fn(batch)
    assert out["pixel_values"].shape == (1, 8, 8, 3)   # NHWC


def test_generation_vocab_roundtrip():
    v = GenerationVocab(list("abc"))
    ids = v.prepare("cab", size=8)
    assert v.unprepare(ids) == "cab"
    assert v("ab")["input_ids"] == v.tokenise("ab")
    assert v.decode(v.tokenise("zz")) == "<UNK><UNK>"
    assert v.ctc_collapse(v.tokenise("a_ab" ) + v.tokenise("b")) \
        == v.tokenise("aab")


def test_cer_wer():
    assert edit_distance("kitten", "sitting") == 3
    assert char_error_rate(["abc"], ["abc"]) == 0.0
    np.testing.assert_allclose(char_error_rate(["abcd"], ["abc"]), 1 / 3)
    np.testing.assert_allclose(
        word_error_rate(["the cat sat"], ["the dog sat"]), 1 / 3)


def test_pickle_and_lyapunov_io(tmp_path):
    p = str(tmp_path / "sub" / "x.pkl")
    write_pickle({"a": 1}, p)
    assert read_pickle(p) == {"a": 1}
    recs = {0: [[1, 0, 0.9, 0, 0.12]], 3: [[3, 3, 0.5, 3, -0.2]]}
    lp = str(tmp_path / "lyap.pkl")
    save_lyapunov_records(recs, lp)
    back = load_lyapunov_records(lp)
    assert back[0][0][4] == 0.12 and back[3][0][0] == 3
