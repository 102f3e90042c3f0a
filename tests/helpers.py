"""Shared test fixtures: a tiny locally-trained BPE tokenizer (no network
egress in CI, so nothing is fetched from the HF Hub — mirrors the reference's
vendored-assets strategy, SURVEY.md §4)."""

import functools

_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "speech language models transcribe and continue audio",
    "hello world how are you today",
    "transcribe the following audio please",
    "<|begin_of_text|> <|eot_id|> user assistant system",
    "0 1 2 3 4 5 6 7 8 9 a b c d e f g h i j k l m n o p q r s t u v w x y z",
]

CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "<|start|>{{ message.role }}\n{{ message.content }}<|eot_id|>"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|start|>assistant\n{% endif %}"
)


@functools.lru_cache(maxsize=1)
def make_tiny_tokenizer(vocab_size: int = 384):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<|eot_id|>", "<|begin_of_text|>", "<|start|>"],
        show_progress=False,
    )
    tok.train_from_iterator(_CORPUS, trainer)
    wrapped = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|eot_id|>",
        bos_token="<|begin_of_text|>",
    )
    wrapped.chat_template = CHAT_TEMPLATE
    return wrapped
