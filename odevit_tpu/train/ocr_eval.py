"""OCR evaluation loops (parity: /root/reference/test.py:176-299,
``test_ocr_task_ctc`` / ``test_ocr_task``).

These loops are unreachable dead code in the reference (no caller wires
an OCR dataset), ported for inventory completeness around the already-
ported vocabulary/CER/WER substrate (utils/text.py). TPU-native
adaptations, documented where they diverge:

* CTC loss comes from ``optax.ctc_loss`` (the reference uses
  ``torch.nn.CTCLoss``; golden-parity-tested against it in
  tests/test_ocr_eval.py) and the forward runs through a caller-supplied
  jitted ``logits_fn`` — models are immutable here, so the loops return
  metrics instead of the reference's ``(model, loss)`` tuple.
* The reference evaluates only ``log_every`` batches per call (the
  ``break`` at test.py:231/291) and divides sums by ``log_every``
  regardless of how many batches actually ran; the slice quirk is
  reproduced, but the denominator is deliberately fixed to the number
  of batches that ran when the loader is shorter than ``log_every``
  (the reference would silently deflate every metric there).
* ``greedy_generate`` provides a compiler-friendly ``lax.scan`` greedy
  decoder as the stand-in for the reference's HF ``model.generate``.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from odevit_tpu.utils.text import (GenerationVocab, char_error_rate,
                                   word_error_rate)


def ctc_greedy_decode(logits, vocab: GenerationVocab):
    """Greedy CTC decode: per-frame argmax, collapse repeats, drop
    blanks/pads (the reference's ``ctc_decoder`` callable)."""
    ids = np.asarray(jnp.argmax(logits, axis=-1))
    return [vocab.decode(vocab.ctc_collapse(row)) for row in ids]


def ctc_loss(logits, tokens, vocab: GenerationVocab):
    """Mean CTC loss over the batch (optax.ctc_loss; blank = the vocab's
    blank token, label padding = the vocab's pad token — the reference's
    handcrafted pad_token_id==0 convention, test.py:206-209)."""
    import optax
    logit_paddings = jnp.zeros(logits.shape[:2], jnp.float32)
    label_paddings = (tokens == vocab.pad_token_id).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, tokens,
                             label_paddings,
                             blank_id=vocab.blank_token_id)
    return jnp.mean(per_seq)


def greedy_generate(decode_step: Callable, batch_size: int, *,
                    bos_id: int, eos_id: int, max_len: int):
    """Greedy autoregressive decode under ``lax.scan`` (static length,
    post-EOS tokens overwritten with ``eos_id``): the TPU-native
    equivalent of the reference's HF ``model.generate`` call.

    ``decode_step(prev_ids [B, t<=max_len])`` must return next-token
    logits [B, V] given the tokens generated so far, padded to max_len
    (a closure over the encoded image features).
    """
    tokens0 = jnp.full((batch_size, max_len), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(bos_id)

    def body(carry, t):
        tokens, done = carry
        logits = decode_step(tokens)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = tokens.at[:, t].set(nxt)
        done = done | (nxt == eos_id)
        return (tokens, done), None

    (tokens, _), _ = jax.lax.scan(
        body, (tokens0, jnp.zeros(batch_size, bool)),
        jnp.arange(1, max_len))
    return tokens


def eval_ocr_ctc(loader, logits_fn: Callable, vocab: GenerationVocab, *,
                 logger=None, mode: str = "val", log_every: int = 10):
    """CTC OCR evaluation (reference ``test_ocr_task_ctc``).

    ``logits_fn(pixel_values) -> [B, T, V]`` frame logits. Batches must
    carry ``pixel_values``, ``tokens`` (padded ids) and ``text`` (raw
    strings). Returns {"loss", "cer", "wer"} averaged the reference way.
    """
    sums = {"loss": 0.0, "cer": 0.0, "wer": 0.0}
    ran = 0
    for batch_idx, data in enumerate(loader):
        logits = logits_fn(data["pixel_values"])
        tokens = jnp.asarray(data["tokens"])
        sums["loss"] += float(ctc_loss(logits, tokens, vocab))
        preds = ctc_greedy_decode(logits, vocab)
        sums["cer"] += char_error_rate(preds, data["text"])
        sums["wer"] += word_error_rate(preds, data["text"])
        ran += 1
        if (batch_idx + 1) % log_every == 0:
            break                      # reference quirk: eval a slice
    denom = max(min(log_every, ran), 1)
    metrics = {k: v / denom for k, v in sums.items()}
    if logger:
        logger.log({f"{mode}/epoch_{k}": v for k, v in metrics.items()})
    return metrics


def eval_ocr_seq2seq(loader, loss_fn: Callable, generate_fn: Callable,
                     vocab: GenerationVocab, *, logger=None,
                     mode: str = "val", log_every: int = 100):
    """Seq2seq OCR evaluation (reference ``test_ocr_task``).

    ``loss_fn(pixel_values, tokens) -> scalar`` teacher-forced loss;
    ``generate_fn(pixel_values) -> [B, L]`` generated ids (e.g. a
    ``greedy_generate`` closure). Returns {"loss", "cer", "wer"}.
    """
    sums = {"loss": 0.0, "cer": 0.0, "wer": 0.0}
    ran = 0
    for batch_idx, data in enumerate(loader):
        tokens = jnp.asarray(data["tokens"])
        sums["loss"] += float(loss_fn(data["pixel_values"], tokens))
        gen = np.asarray(generate_fn(data["pixel_values"]))
        preds = [vocab.unprepare(row) for row in gen]
        sums["cer"] += char_error_rate(preds, data["text"])
        sums["wer"] += word_error_rate(preds, data["text"])
        ran += 1
        if (batch_idx + 1) % log_every == 0:
            break
    denom = max(min(log_every, ran), 1)
    metrics = {k: v / denom for k, v in sums.items()}
    if logger:
        logger.log({f"{mode}/epoch_{k}": v for k, v in metrics.items()})
    return metrics
