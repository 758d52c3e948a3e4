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
