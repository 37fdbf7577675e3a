"""Character vocabulary + CER/WER metrics.

Vestigial-parity components: the reference carries an OCR vocab
(utils.py:376-443, GenerationVocab) and CTC/seq2seq eval loops using
torchmetrics CER/WER (test.py:176-299) left over from another project.
They're part of its public surface, so equivalents live here: a
functional character vocab (with the start/stop handling the reference
references but never defines fixed) and pure-python edit-distance
CER/WER.
"""

from __future__ import annotations

from typing import Dict, List, Sequence


class GenerationVocab:
    BLANK = "_"
    PAD_TAG = "<PAD>"
    UNKNOWN_TAG = "<UNK>"
    START_TAG = "<START>"
    STOP_TAG = "<STOP>"

    def __init__(self, vocab: Sequence[str]):
        self.tokens = [self.BLANK, self.PAD_TAG, self.UNKNOWN_TAG,
                       self.START_TAG, self.STOP_TAG] + list(vocab)
        self.token2index: Dict[str, int] = {
            t: i for i, t in enumerate(self.tokens)}
        self.index2token = {i: t for t, i in self.token2index.items()}

    @property
    def pad_token_id(self):
        return self.token2index[self.PAD_TAG]

    @property
    def blank_token_id(self):
        return self.token2index[self.BLANK]

    def __len__(self):
        return len(self.token2index)

    def __call__(self, line: Sequence[str], add_special_tokens=False):
        return {"input_ids": self.tokenise(line)}

    def tokenise(self, line: Sequence[str]) -> List[int]:
        unk = self.token2index[self.UNKNOWN_TAG]
        return [self.token2index.get(ch, unk) for ch in line]

    def pad(self, tokenised: List[int], size: int) -> List[int]:
        out = [self.pad_token_id] * size
        m = min(len(tokenised), size - 2)
        out[0] = self.token2index[self.START_TAG]
        out[1:m + 1] = tokenised[:m]
        out[m + 1] = self.token2index[self.STOP_TAG]
        return out

    def prepare(self, line: Sequence[str], size: int) -> List[int]:
        return self.pad(self.tokenise(line), size)

    def unpad(self, padded: Sequence[int]) -> List[int]:
        skip = {self.token2index[self.START_TAG], self.pad_token_id}
        stop = self.token2index[self.STOP_TAG]
        out: List[int] = []
        for tok in padded:
            if tok == stop:
                break
            if tok not in skip:
                out.append(int(tok))
        return out

    def decode(self, tokenised: Sequence[int]) -> str:
        return "".join(self.index2token.get(int(i), self.UNKNOWN_TAG)
                       for i in tokenised)

    def unprepare(self, padded: Sequence[int]) -> str:
        return self.decode(self.unpad(padded))

    def ctc_collapse(self, ids: Sequence[int]) -> List[int]:
        """Collapse repeats then drop blanks (CTC greedy decode)."""
        out: List[int] = []
        prev = None
        for i in ids:
            if i != prev and i != self.blank_token_id:
                out.append(int(i))
            prev = i
        return out


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance (insert/delete/substitute, all cost 1)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def char_error_rate(preds: Sequence[str], targets: Sequence[str]) -> float:
    """Total edit distance over total target characters (torchmetrics
    CharErrorRate semantics)."""
    errors = sum(edit_distance(p, t) for p, t in zip(preds, targets))
    total = sum(len(t) for t in targets)
    return errors / max(total, 1)


def word_error_rate(preds: Sequence[str], targets: Sequence[str]) -> float:
    errors = sum(edit_distance(p.split(), t.split())
                 for p, t in zip(preds, targets))
    total = sum(len(t.split()) for t in targets)
    return errors / max(total, 1)
