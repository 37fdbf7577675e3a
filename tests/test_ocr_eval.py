"""OCR eval loops: golden CTC parity vs torch + loop semantics.

Parity anchor: /root/reference/test.py:176-299 (test_ocr_task_ctc /
test_ocr_task — dead code there; the loops and their loss/decode
building blocks are verified here against torch and by construction).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odevit_tpu.train.ocr_eval import (ctc_greedy_decode, ctc_loss,
                                       eval_ocr_ctc, eval_ocr_seq2seq,
                                       greedy_generate)
from odevit_tpu.utils.text import GenerationVocab

VOCAB = GenerationVocab("abcdefgh ")


def _tokens(texts, size=12):
    return np.asarray([VOCAB.prepare(t, size) for t in texts])


def test_ctc_loss_matches_torch():
    """optax.ctc_loss (as wired: blank/pad from the vocab) equals
    torch.nn.CTCLoss per sequence."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, T, L = 3, 17, 12
    V = len(VOCAB)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    texts = ["abc hgf", "hello"[:4], "gg"]
    # tokens without START/STOP framing: CTC labels are the raw ids
    toks = np.full((B, L), VOCAB.pad_token_id, np.int64)
    for i, t in enumerate(texts):
        ids = VOCAB.tokenise(t)
        toks[i, :len(ids)] = ids

    ours = np.zeros(B)
    import optax
    per_seq = optax.ctc_loss(
        jnp.asarray(logits), jnp.zeros((B, T)), jnp.asarray(toks),
        (jnp.asarray(toks) == VOCAB.pad_token_id).astype(jnp.float32),
        blank_id=VOCAB.blank_token_id)
    ours = np.asarray(per_seq)

    logp = torch.log_softmax(torch.tensor(logits), dim=-1)
    lengths = torch.tensor([len(VOCAB.tokenise(t)) for t in texts])
    crit = torch.nn.CTCLoss(blank=VOCAB.blank_token_id,
                            reduction="none", zero_infinity=False)
    want = crit(logp.permute(1, 0, 2), torch.tensor(toks),
                torch.full((B,), T, dtype=torch.int32), lengths)
    np.testing.assert_allclose(ours, want.numpy(), rtol=1e-4, atol=1e-4)

    # the wrapper returns the batch mean of exactly these
    m = float(ctc_loss(jnp.asarray(logits), jnp.asarray(toks), VOCAB))
    np.testing.assert_allclose(m, float(want.mean()), rtol=1e-4)


def test_ctc_greedy_decode_collapses():
    V = len(VOCAB)
    a = VOCAB.tokenise("a")[0]
    b = VOCAB.tokenise("b")[0]
    blank = VOCAB.blank_token_id
    # runs collapse, but a blank separates two instances of a letter
    frames = [a, a, blank, a, b, b, blank, blank, b]
    logits = np.full((1, len(frames), V), -10.0, np.float32)
    for t, tok in enumerate(frames):
        logits[0, t, tok] = 10.0
    assert ctc_greedy_decode(jnp.asarray(logits), VOCAB) == ["aabb"]


def _ctc_batches(n, rng):
    for i in range(n):
        texts = ["abc", "de f"]
        yield {"pixel_values": rng.standard_normal((2, 8, 8, 1)),
               "tokens": np.asarray(
                   [[*VOCAB.tokenise(t),
                     *[VOCAB.pad_token_id] * (10 - len(t))][:10]
                    for t in texts]),
               "text": texts}


def test_eval_ocr_ctc_loop():
    rng = np.random.default_rng(1)
    V = len(VOCAB)

    def logits_fn(pix):
        r = np.random.default_rng(int(abs(np.sum(pix)) * 1e3) % 2**31)
        return jnp.asarray(r.standard_normal((pix.shape[0], 15, V)),
                           jnp.float32)

    logged = {}

    class Logger:
        def log(self, d):
            logged.update(d)

    m = eval_ocr_ctc(_ctc_batches(7, rng), logits_fn, VOCAB,
                     logger=Logger(), log_every=3)
    assert set(m) == {"loss", "cer", "wer"}
    assert all(np.isfinite(v) for v in m.values())
    assert 0.0 <= m["cer"] and 0.0 <= m["wer"] <= 1.5
    assert "val/epoch_cer" in logged
    # the reference's slice semantics: only log_every batches consumed
    it = iter(_ctc_batches(7, rng))
    eval_ocr_ctc(it, logits_fn, VOCAB, log_every=3)
    assert len(list(it)) == 4


def test_eval_ocr_seq2seq_loop_with_greedy_generate():
    rng = np.random.default_rng(2)
    V = len(VOCAB)
    target = VOCAB.prepare("abc", 8)

    def decode_step(tokens):
        # emit the target sequence position by position: the logit for
        # step t depends only on how many non-pad tokens precede it
        t = jnp.sum((tokens != VOCAB.token2index[VOCAB.STOP_TAG])
                    .astype(jnp.int32), axis=1)
        t = jnp.clip(t, 0, len(target) - 1)
        onehot = jax.nn.one_hot(jnp.asarray(target)[t], V) * 10.0
        return onehot

    def generate_fn(pix):
        return greedy_generate(decode_step, pix.shape[0],
                               bos_id=VOCAB.token2index[VOCAB.START_TAG],
                               eos_id=VOCAB.token2index[VOCAB.STOP_TAG],
                               max_len=8)

    def loss_fn(pix, tokens):
        return jnp.asarray(0.5)

    batches = ({"pixel_values": rng.standard_normal((2, 8, 8, 1)),
                "tokens": _tokens(["abc", "abc"], 8),
                "text": ["abc", "abc"]} for _ in range(2))
    m = eval_ocr_seq2seq(batches, loss_fn, generate_fn, VOCAB,
                         log_every=2)
    assert m["loss"] == 0.5
    assert m["cer"] == 0.0 and m["wer"] == 0.0
