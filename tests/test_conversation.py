"""Prompt-rendering parity tests.

Expected strings are derived from the reference get_prompt semantics
(/root/reference/streammind/conversation.py:36-130).
"""
from streammind_tpu.conversation import (
    SeparatorStyle,
    conv_templates,
    merge_consecutive_user_turns,
)


def test_mistral_instruct_single_turn():
    conv = conv_templates["mistral_instruct"].copy()
    conv.append_message(conv.roles[0], "<video>\nWhat is happening?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.startswith("[INST] <<SYS>>\n")
    assert "<</SYS>>\n\n" in prompt
    # LLAMA_2 style injects the video directive after the system block
    assert "Please describe the video content in detail" in prompt
    assert prompt.endswith("<video>\nWhat is happening? [/INST]")


def test_mistral_instruct_multi_turn_closes_with_eos():
    conv = conv_templates["mistral_instruct"].copy()
    conv.append_message(conv.roles[0], "<video>\nDescribe.")
    conv.append_message(conv.roles[1], "A goal is scored.")
    prompt = conv.get_prompt()
    assert prompt.endswith(" A goal is scored. </s>")


def test_live_template_merges_user_runs():
    conv = conv_templates["conv_mistral_instruct_LIVE"].copy()
    conv.append_message("USER", "first")
    conv.append_message("USER", "second")
    conv.append_message("ASSISTANT", "reply")
    prompt = conv.get_prompt()
    assert "[INST] <<SYS>>" in prompt
    assert "first second" in prompt
    # LIVE style does NOT inject the video directive
    assert "Please describe the video content" not in prompt
    assert prompt.endswith(" reply </s>")


def test_live_template_drops_trailing_user():
    msgs = [["USER", "a"], ["ASSISTANT", "b"], ["USER", "dangling"]]
    merged = merge_consecutive_user_turns(msgs)
    assert merged == [["USER", "a"], ["ASSISTANT", "b"]]


def test_vicuna_v1_two_style():
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "Hello")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt == conv.system + " " + "USER: Hello ASSISTANT:"


def test_plain_style():
    conv = conv_templates["plain"].copy()
    conv.append_message("", "<video>caption here")
    conv.append_message("", "the answer")
    prompt = conv.get_prompt()
    assert prompt == "<video>caption here\nthe answer"


def test_media_tuple_first_message_moves_token_to_front():
    conv = conv_templates["mistral_instruct"].copy()
    conv.modality = "video"
    conv.append_message(conv.roles[0], ("tell me about <video> please", "vid.mp4", "Default"))
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert "<video>\ntell me about  please" in prompt


def test_all_registered_templates_render():
    for name, conv in conv_templates.items():
        c = conv.copy()
        c.append_message(c.roles[0], "hi")
        c.append_message(c.roles[1], "hello")
        assert isinstance(c.get_prompt(), str)


def test_qwen_chatml_template():
    """Qwen2 ChatML: the reference sets version='qwen' (__init__.py:27-29)
    but ships no template; ours renders the standard Qwen2 chat format."""
    conv = conv_templates["qwen"].copy()
    conv.append_message(conv.roles[0], "describe the video")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\ndescribe the video<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_registry_byte_parity_with_reference_goldens():
    """Every reference registry key renders byte-equal to the vendored
    golden prompts (generated from the reference's own get_prompt,
    /root/reference/streammind/conversation.py:36-130,549-567), for both a
    media-bearing multi-turn dialogue and a plain one.  'plain'/'v0_plain'
    golden single-turn renders only (the upstream PLAIN branch crashes past
    one turn: sep2=None)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "conv_golden.json")
    with open(path) as f:
        goldens = json.load(f)
    media_only = {"plain", "v0_plain"}
    for key, expected in goldens.items():
        name, _, variant = key.partition("::")
        conv = conv_templates[name].copy()
        r0, r1 = conv.roles
        if name in media_only:
            if variant == "plain":
                conv.append_message(r0, "pretraining caption")
            else:
                conv.append_message(r0, ("<image>\ncaption this", None, None))
        elif variant == "plain":
            conv.append_message(r0, "Hello there")
            conv.append_message(r1, None)
        else:
            conv.append_message(r0, ("<image>\nWhat is in the video?", None, None))
            conv.append_message(r1, "A cat chasing a ball.")
            conv.append_message(r0, "And what happens next?")
            conv.append_message(r1, None)
        assert conv.get_prompt() == expected, f"template {key} drifted"


def test_reference_registry_keys_all_present():
    """Exact key parity with the reference registry (conversation.py:549-567)."""
    reference_keys = {
        "default", "v0", "v1", "vicuna_v1", "llama_2", "plain", "v0_plain",
        "llava_v0", "v0_mmtag", "llava_v1", "v1_mmtag", "llava_llama_2",
        "video_llama_beta", "mistral_instruct", "mpt",
        "conv_mistral_instruct_LIVE",
    }
    assert reference_keys <= set(conv_templates)
    # "default" resolves to vicuna_v0 (baked few-shot, offset 2)
    assert conv_templates["default"].offset == 2
    assert conv_templates["default"] is conv_templates["v0"]


def test_mmtag_media_handling():
    """mmtag templates wrap media in a tagged exchange instead of
    prepending the modal token (reference conversation.py:43-46)."""
    conv = conv_templates["v1_mmtag"].copy()
    conv.append_message(conv.roles[0], ("<image>\nwhat is this?", None, None))
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "<Image><image></Image>" in p and "Received." in p
    assert "what is this?" in p and "<image>\nwhat" not in p
