"""Full-prompt token-sequence parity against transformers (VERDICT r3 #2).

Real ``handy-computer/Qwen3-ASR-*-gguf`` artifacts carry a **Jinja**
``tokenizer.chat_template`` (never a literal ``{audio}`` string), and the
reference's transcribe.cpp renders it in C++ (``qwen3_asr_server.py:318-321``).
This suite pins the whole chain externally:

1. our sandboxed Jinja render == transformers' ``apply_chat_template``
   render, byte-for-byte, for a faithful Qwen-Omni-style template;
2. the ENTIRE assembled token sequence — system/context wrap, audio span
   expansion (``processing_qwen3_omni_moe.py:255`` semantics: the audio
   token repeated once per audio embedding), generation suffix — matches
   what HF's tokenizer produces for the same conversation, token-for-token
   (not just counts, which ``test_transformers_token_count_parity`` pins);
3. a GGUF whose template is Jinja LOADS (the round-3 landmine was a raise
   at ``model.py:278-280``), and unrenderable templates degrade to the
   built-in convention instead of refusing to serve.
"""

import sys

import pytest

sys.path.insert(0, "tests")

pytest.importorskip("transformers")
pytest.importorskip("jinja2")
tokenizers = pytest.importorskip("tokenizers")

from light_whisper_tpu.models.qwen3_asr.prompt import (
    asr_messages,
    render_chat_template,
    resolve_prompt_ids,
    resolve_prompt_text,
)
from light_whisper_tpu.models.qwen3_asr.tokenizer import BPETokenizer

_QWEN_REGEX = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)

SPECIALS = ["<|im_start|>", "<|im_end|>", "<|audio_start|>", "<|audio_pad|>", "<|audio_end|>"]
AUDIO_TOKEN = "<|audio_pad|>"

# A faithful Qwen-Omni-family chat template (the multimodal message loop
# convention every Qwen audio model ships): system default injection,
# string-vs-parts content, audio items emitting bos/pad/eos, generation
# prompt. Not byte-identical to any one checkpoint's template — the
# contract under test is that ANY template of this family resolves to the
# same tokens through us and through transformers.
QWEN_OMNI_TEMPLATE = (
    "{% set audio_count = namespace(value=0) %}"
    "{% for message in messages %}"
    "{% if loop.first and message['role'] != 'system' %}"
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "{% endif %}"
    "<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}"
    "{{ message['content'] }}<|im_end|>\n"
    "{% else %}"
    "{% for content in message['content'] %}"
    "{% if content['type'] == 'audio' or 'audio' in content or 'audio_url' in content %}"
    "{% set audio_count.value = audio_count.value + 1 %}"
    "<|audio_start|><|audio_pad|><|audio_end|>"
    "{% elif content['type'] == 'text' %}"
    "{{ content['text'] }}"
    "{% endif %}"
    "{% endfor %}"
    "<|im_end|>\n"
    "{% endif %}"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)

_TRAIN_TEXT = [
    "this is a dictated sentence about systems and models",
    "system user assistant helpful audio\n",
    "我们在测试中文语音转写的分词行为，标点，以及数字123和2048。",
    "mixed 中文 and english words with  double  spaces\nand newlines\n",
]


@pytest.fixture(scope="module")
def pair():
    """(HF PreTrainedTokenizerFast, our BPETokenizer) over one shared vocab
    with the Qwen special tokens appended — the same dual-build pattern as
    test_tokenizer_hf_parity, extended with specials."""
    import json

    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(Regex(_QWEN_REGEX), behavior="isolated"),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=420,
        special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(_TRAIN_TEXT, trainer)
    tok.add_special_tokens(SPECIALS)

    vocab = tok.get_vocab()
    tokens = [None] * len(vocab)
    for text, idx in vocab.items():
        tokens[idx] = text
    blob = json.loads(tok.to_str())
    merges = [m if isinstance(m, str) else " ".join(m) for m in blob["model"]["merges"]]
    types = [3 if t in SPECIALS else 1 for t in tokens]
    ours = BPETokenizer(tokens, merges, token_types=types)

    hf = PreTrainedTokenizerFast(tokenizer_object=tok)
    return hf, ours


def test_render_matches_transformers_apply_chat_template(pair):
    hf, _ours = pair
    for context in ("", "专有名词: Pallas, XLA", "bias toward: kaldi fbank"):
        want = hf.apply_chat_template(
            asr_messages(context),
            chat_template=QWEN_OMNI_TEMPLATE,
            tokenize=False,
            add_generation_prompt=True,
        )
        got = render_chat_template(QWEN_OMNI_TEMPLATE, context)
        assert got == want


@pytest.mark.parametrize("n_audio", [1, 13, 104])
def test_full_prompt_token_sequence_matches_hf(pair, n_audio):
    """The serving contract sequence prefix+[audio]*n+suffix must equal
    HF's tokenization of the processor-expanded render, token-for-token."""
    hf, ours = pair
    audio_id = ours.token_to_id[AUDIO_TOKEN]
    prefix_ids, suffix_ids = resolve_prompt_ids(QWEN_OMNI_TEMPLATE, ours, audio_id)
    got = prefix_ids + [audio_id] * n_audio + suffix_ids

    rendered = hf.apply_chat_template(
        asr_messages(),
        chat_template=QWEN_OMNI_TEMPLATE,
        tokenize=False,
        add_generation_prompt=True,
    )
    # processing_qwen3_omni_moe.py:255/302 — expand the single audio token
    # to one slot per audio embedding, then tokenize the whole prompt.
    expanded = rendered.replace(AUDIO_TOKEN, AUDIO_TOKEN * n_audio, 1)
    want = hf(expanded, add_special_tokens=False)["input_ids"]
    assert got == want


def test_context_rides_the_system_turn(pair):
    hf, ours = pair
    audio_id = ours.token_to_id[AUDIO_TOKEN]
    context = "专有名词: DFSMN"
    prefix_ids, suffix_ids = resolve_prompt_ids(
        QWEN_OMNI_TEMPLATE, ours, audio_id, context=context
    )
    rendered = hf.apply_chat_template(
        asr_messages(context),
        chat_template=QWEN_OMNI_TEMPLATE,
        tokenize=False,
        add_generation_prompt=True,
    )
    expanded = rendered.replace(AUDIO_TOKEN, AUDIO_TOKEN * 2, 1)
    assert prefix_ids + [audio_id] * 2 + suffix_ids == hf(
        expanded, add_special_tokens=False
    )["input_ids"]
    assert context in ours.decode(prefix_ids)


def test_jinja_gguf_artifact_loads(tmp_path):
    """Round-3 landmine: a GGUF carrying a Jinja chat template must load.

    The tiny artifact's audio token is ``<|audio|>``; the template places
    it via the message loop, and the model must resolve prefix/suffix
    around it instead of raising on the missing ``{audio}`` literal."""
    from helpers.tiny_model import tiny_config, tiny_tensors, tiny_vocab

    from light_whisper_tpu.models.qwen3_asr.export import write_model
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    jinja = QWEN_OMNI_TEMPLATE.replace(
        "<|audio_start|><|audio_pad|><|audio_end|>", "<|audio|>"
    )
    cfg = tiny_config()
    tokens, types = tiny_vocab()
    path = str(tmp_path / "jinja.gguf")
    write_model(
        path,
        cfg,
        tiny_tensors(cfg),
        {
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.token_type": types,
            "tokenizer.ggml.merges": [],
            "tokenizer.chat_template": jinja,
        },
        quantize=False,
    )
    model = Qwen3ASRModel(path)
    text = model.tokenizer.decode(model.prefix_ids, skip_special=False)
    assert text.startswith("<|im_start|>system\n")
    assert text.endswith("<|im_start|>user\n")
    assert model.config.audio_token_id not in model.prefix_ids
    assert model.config.audio_token_id not in model.suffix_ids
    suffix = model.tokenizer.decode(model.suffix_ids, skip_special=False)
    assert suffix.endswith("<|im_start|>assistant\n")


def test_unrenderable_template_falls_back():
    """Broken Jinja or a render with no audio token degrades to the
    built-in convention — initialize() must not fail on template quirks."""
    from light_whisper_tpu.models.qwen3_asr.prompt import DEFAULT_TEMPLATE

    want = DEFAULT_TEMPLATE.split("{audio}", 1)
    assert resolve_prompt_text("{% broken", "<|audio|>") == tuple(want)
    assert resolve_prompt_text("{{ messages }}", "<|audio|>") == tuple(want)
    assert resolve_prompt_text(None, "<|audio|>") == tuple(want)
    # explicit {audio} templates keep their literal split
    assert resolve_prompt_text("A{audio}B", None) == ("A", "B")
