"""A fake tokenizer reproducing the sentencepiece behaviors the reference's
label-masking arithmetic depends on:
  - BOS prepended to every call
  - "</s>" is a special token (id 2), split out of the text
  - a space ADJACENT to a special-token boundary becomes a standalone '▁'
    token (trailing space of a chunk, or a space-only chunk between two
    specials); a space inside text merges into the following word
"""
from typing import List

# '▁' is 29871 in the real Mistral vocab; tests use tiny models with
# vocab_size 256, so all fake ids must stay below that (out-of-vocab labels
# turn into NaN via take_along_axis fill semantics).
SPACE_ID = 250


class SPLikeTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    unk_token_id = 0
    pad_token_id = 0
    eos_token = "</s>"
    model_max_length = 2048

    def __init__(self):
        self._vocab = {"</s>": 2, "<s>": 1, "<unk>": 0}
        self._rev = {2: "</s>", 1: "<s>", 0: "<unk>"}
        self._next = 10

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def _word_id(self, w: str) -> int:
        if w not in self._vocab:
            self._vocab[w] = self._next
            self._rev[self._next] = w
            self._next += 1
            if self._next >= SPACE_ID:  # wrap inside the tiny test vocab
                self._next = 10
        return self._vocab[w]

    def _encode_chunk(self, chunk: str) -> List[int]:
        ids = []
        for w in chunk.split():
            ids.append(self._word_id(w))
        if chunk.endswith(" ") or (chunk != "" and chunk.strip() == ""):
            ids.append(SPACE_ID)
        return ids

    def __call__(self, text: str):
        ids = [self.bos_token_id]
        parts = text.split("</s>")
        for i, part in enumerate(parts):
            ids.extend(self._encode_chunk(part))
            if i != len(parts) - 1:
                ids.append(self.eos_token_id)
        return self._Out(ids)

    def decode(self, ids) -> str:
        words = [self._rev.get(int(i), f"<{int(i)}>") for i in ids if int(i) != SPACE_ID]
        return " ".join(w for w in words if w not in ("<s>",))
