"""Jinja-subset engine + chat template tests (≡ reference tests/test-jinja.cpp
+ test-chat-template.cpp)."""

import pytest

from tpullm.chat import (
    apply_chat_template,
    detect_builtin,
    extract_reasoning,
    parse_tool_calls,
)
from tpullm.jinja import RaisedException, Template, TemplateError, render

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


# -- engine basics -----------------------------------------------------------------


def test_output_and_text():
    assert render("a{{ 1 + 2 }}b") == "a3b"
    assert render("{{ 'x' + 'y' }}") == "xy"
    assert render("{{ name }}!", name="bob") == "bob!"


def test_if_elif_else():
    t = "{% if x > 2 %}big{% elif x > 0 %}small{% else %}neg{% endif %}"
    assert render(t, x=5) == "big"
    assert render(t, x=1) == "small"
    assert render(t, x=-1) == "neg"


def test_for_loop_and_loop_vars():
    t = "{% for m in items %}{{ loop.index }}:{{ m }}{% if not loop.last %},{% endif %}{% endfor %}"
    assert render(t, items=["a", "b", "c"]) == "1:a,2:b,3:c"


def test_for_else_and_empty():
    assert render("{% for x in items %}{{ x }}{% else %}none{% endfor %}", items=[]) == "none"


def test_set_and_namespace():
    assert render("{% set x = 2 %}{{ x * 3 }}") == "6"
    t = ("{% set ns = namespace(found=false) %}"
         "{% for m in ms %}{% if m == 1 %}{% set ns.found = true %}{% endif %}{% endfor %}"
         "{{ ns.found }}")
    assert render(t, ms=[0, 1, 2]) == "True"


def test_set_survives_loop_scope():
    # jinja namespace-less set inside a loop writes outer scope here
    t = "{% set last = '' %}{% for m in ms %}{% set last = m %}{% endfor %}{{ last }}"
    assert render(t, ms=["a", "b"]) == "b"


def test_filters():
    assert render("{{ ' x '|trim }}") == "x"
    assert render("{{ xs|length }}", xs=[1, 2]) == "2"
    assert render("{{ xs|join(', ') }}", xs=["a", "b"]) == "a, b"
    assert render("{{ missing|default('d') }}") == "d"
    assert render("{{ d|tojson }}", d={"a": 1}) == '{"a": 1}'
    assert render("{{ s|upper }}", s="hi") == "HI"
    assert render("{{ xs|first }}{{ xs|last }}", xs=[1, 2, 3]) == "13"


def test_tilde_concat():
    assert render("{{ 'a' ~ 1 ~ 'b' }}") == "a1b"


def test_is_defined_tests():
    t = "{% if x is defined %}yes{% else %}no{% endif %}"
    assert render(t, x=1) == "yes"
    assert render(t) == "no"
    assert render("{% if x is none %}n{% endif %}", x=None) == "n"
    assert render("{% if x is not none %}v{% endif %}", x=3) == "v"


def test_methods_and_subscripts():
    assert render("{{ m['role'] }}", m={"role": "user"}) == "user"
    assert render("{{ m.role }}", m={"role": "user"}) == "user"
    assert render("{{ s.startswith('ab') }}", s="abc") == "True"
    assert render("{{ s.split(',')[1] }}", s="a,b,c") == "b"
    assert render("{{ xs[1:] | join('') }}", xs=["a", "b", "c"]) == "bc"
    assert render("{{ xs[-1] }}", xs=[1, 2, 9]) == "9"


def test_raise_exception():
    with pytest.raises(RaisedException, match="boom"):
        render("{% if true_ %}{{ raise_exception('boom') }}{% endif %}", true_=True)


def test_dunder_rejected():
    with pytest.raises(TemplateError):
        render("{{ x.__class__ }}", x=1)


def test_whitespace_control():
    assert render("a  {{- 'b' -}}  c") == "abc"
    assert render("x {%- set a = 1 %}{{ a }}") == "x1"


def test_break_continue():
    t = "{% for x in xs %}{% if x == 2 %}{% continue %}{% endif %}{% if x == 4 %}{% break %}{% endif %}{{ x }}{% endfor %}"
    assert render(t, xs=[1, 2, 3, 4, 5]) == "13"


# -- real chat templates ----------------------------------------------------------

CHATML_TPL = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
    " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def test_chatml_template_renders():
    out = apply_chat_template(CHATML_TPL, MSGS, add_generation_prompt=True)
    assert out.startswith("<|im_start|>system\nYou are helpful.<|im_end|>\n")
    assert out.endswith("<|im_start|>assistant\n")
    assert out.count("<|im_start|>") == 5


LLAMA3_TPL = (
    "{{ bos_token }}{% for message in messages %}"
    "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' "
    "+ message['content'] | trim + '<|eot_id|>' }}{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
)


def test_llama3_template_renders():
    out = apply_chat_template(LLAMA3_TPL, MSGS, bos_token="<|begin_of_text|>")
    assert out.startswith("<|begin_of_text|><|start_header_id|>system<|end_header_id|>")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


ZEPHYR_TPL = (
    "{% for message in messages %}\n{% if message['role'] == 'user' %}\n"
    "{{ '<|user|>\n' + message['content'] + eos_token }}\n"
    "{% elif message['role'] == 'system' %}\n"
    "{{ '<|system|>\n' + message['content'] + eos_token }}\n"
    "{% elif message['role'] == 'assistant' %}\n"
    "{{ '<|assistant|>\n'  + message['content'] + eos_token }}\n"
    "{% endif %}\n{% if loop.last and add_generation_prompt %}\n"
    "{{ '<|assistant|>' }}\n{% endif %}\n{% endfor %}"
)


def test_zephyr_template_renders():
    out = apply_chat_template(ZEPHYR_TPL, MSGS, eos_token="</s>")
    assert "<|user|>\nHi</s>" in out
    assert out.rstrip().endswith("<|assistant|>")


GEMMA_TPL = (
    "{{ bos_token }}{% if messages[0]['role'] == 'system' %}"
    "{{ raise_exception('System role not supported') }}{% endif %}"
    "{% for message in messages %}"
    "{% if (message['role'] == 'user') != (loop.index0 % 2 == 0) %}"
    "{{ raise_exception('Conversation roles must alternate user/assistant/...') }}"
    "{% endif %}{% if (message['role'] == 'assistant') %}"
    "{% set role = 'model' %}{% else %}{% set role = message['role'] %}{% endif %}"
    "{{ '<start_of_turn>' + role + '\n' + message['content'] | trim + '<end_of_turn>\n' }}"
    "{% endfor %}{% if add_generation_prompt %}{{'<start_of_turn>model\n'}}{% endif %}"
)


def test_gemma_template_renders_and_raises():
    msgs = [{"role": "user", "content": "Hi"}, {"role": "assistant", "content": "Yo"}]
    out = apply_chat_template(GEMMA_TPL, msgs)
    assert "<start_of_turn>user\nHi<end_of_turn>" in out
    assert "<start_of_turn>model\nYo<end_of_turn>" in out
    # system message raises inside the template → builtin fallback kicks in
    out2 = apply_chat_template(GEMMA_TPL, MSGS)
    assert "<start_of_turn>" in out2  # gemma builtin handled it


def test_builtin_detection():
    assert detect_builtin("... <start_of_turn> ...") == "gemma"
    assert detect_builtin("...[SYSTEM_PROMPT]...") == "mistral-v7"
    assert detect_builtin("<|end|> <|assistant|>") == "phi3"
    assert detect_builtin(None) == "chatml"


def test_builtin_renderers_run():
    from tpullm.chat import BUILTIN

    for name, fn in BUILTIN.items():
        out = fn(MSGS, True)
        assert "Hi" in out, name


# -- tool calls / reasoning --------------------------------------------------------


def test_parse_hermes_tool_call():
    text = 'I will check.\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "Paris"}}\n</tool_call>'
    content, calls = parse_tool_calls(text)
    assert content == "I will check."
    assert calls[0]["function"]["name"] == "get_weather"
    assert '"city"' in calls[0]["function"]["arguments"]


def test_parse_bare_json_tool_call():
    content, calls = parse_tool_calls('{"name": "f", "arguments": {"x": 1}}')
    assert content == ""
    assert calls[0]["function"]["name"] == "f"


def test_parse_no_tool_call():
    content, calls = parse_tool_calls("just text { not json }")
    assert calls == []
    assert content == "just text { not json }"


def test_extract_reasoning():
    r, c = extract_reasoning("<think>step 1</think>The answer is 4.")
    assert r == "step 1"
    assert c == "The answer is 4."
    r2, c2 = extract_reasoning("no reasoning")
    assert r2 is None and c2 == "no reasoning"


def test_new_builtin_markers():
    """Spot-check distinctive turn markers of the round-1 builtin additions
    (format strings per src/llama-chat.cpp render switch)."""
    from tpullm.chat import BUILTIN

    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "Hi"},
        {"role": "assistant", "content": "Hello"},
        {"role": "user", "content": "Bye"},
    ]
    expect = {
        "monarch": ["user\nHi</s>\n", "<s>assistant\n"],
        "orion": ["Human: be brief\n\nHi\n\nAssistant: </s>Hello</s>"],
        "openchat": ["GPT4 Correct User: Hi<|end_of_turn|>",
                     "GPT4 Correct Assistant:"],
        "vicuna-orca": ["SYSTEM: be brief\n", "ASSISTANT: Hello</s>\n"],
        "deepseek": ["### Instruction:\nHi\n", "### Response:\nHello\n<|EOT|>\n"],
        "deepseek2": ["User: Hi\n\n", "Assistant: Hello<｜end▁of▁sentence｜>"],
        "command-r": ["<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Hi<|END_OF_TURN_TOKEN|>",
                      "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"],
        "chatglm4": ["[gMASK]<sop>", "<|user|>\nHi", "<|assistant|>\n"],
        "glmedge": ["<|user|>\nHi", "<|assistant|>"],
        "minicpm": ["<用户>Hi<AI>Hello"],
        "exaone3": ["[|system|]be brief[|endofturn|]\n", "[|user|]Hi\n",
                    "[|assistant|]Hello[|endofturn|]\n"],
        "rwkv-world": ["User: Hi\n\nAssistant: Hello\n\n",
                       "User: Bye\n\nAssistant:"],
        "granite": ["<|start_of_role|>user<|end_of_role|>Hi<|end_of_text|>\n",
                    "<|start_of_role|>assistant<|end_of_role|>"],
        "phi4": ["<|im_start|>user<|im_sep|>Hi<|im_end|>",
                 "<|im_start|>assistant<|im_sep|>"],
        "llama4": ["<|header_start|>user<|header_end|>\n\nHi<|eot|>",
                   "<|header_start|>assistant<|header_end|>\n\n"],
        "kimi-k2": ["<|im_user|>user<|im_middle|>Hi<|im_end|>",
                    "<|im_assistant|>assistant<|im_middle|>"],
    }
    for name, needles in expect.items():
        out = BUILTIN[name](msgs, True)
        for needle in needles:
            assert needle in out, (name, needle, out)


def test_new_builtin_detection():
    assert detect_builtin("x <|im_sep|> y") == "phi4"
    assert detect_builtin("x <|im_middle|> y") == "kimi-k2"
    assert detect_builtin("x <|header_start|> y") == "llama4"
    assert detect_builtin("GPT4 Correct User:") == "openchat"
    assert detect_builtin("Human: ... Assistant: </s>") == "orion"
    assert detect_builtin("### Instruction: ... <|EOT|>") == "deepseek"
    assert detect_builtin("SYSTEM: x USER: y ASSISTANT") == "vicuna-orca"
    assert detect_builtin("<|START_OF_TURN_TOKEN|>") == "command-r"
    assert detect_builtin("[gMASK]<sop>") == "chatglm4"
    assert detect_builtin("<用户>") == "minicpm"
    assert detect_builtin("[|system|] [|assistant|]") == "exaone3"
    assert detect_builtin("<|start_of_role|>") == "granite"
    # regressions: old detections still win where they should
    assert detect_builtin("<|im_start|> stuff") == "chatml"
    assert detect_builtin("USER: ASSISTANT:") == "vicuna"


def test_round1_late_builtins():
    from tpullm.chat import BUILTIN, detect_builtin

    msgs = [{"role": "user", "content": "Hi"},
            {"role": "assistant", "content": "Yo"}]
    assert "<|role_start|>user<|role_end|>Hi<|turn_end|>" in BUILTIN["megrez"](msgs, True)
    assert "<|start|>assistant<|message|>Yo<|return|>" in BUILTIN["gpt-oss"](msgs, True)
    assert "<|startoftext|>Hi<|extra_0|>Yo<|eos|>" in BUILTIN["hunyuan-moe"](msgs, False)
    assert BUILTIN["seed-oss"](msgs, True).endswith("<seed:bos>assistant\n")
    assert detect_builtin("uses <|message_sep|> and <|role_sep|>") == "gigachat"


def test_parse_truncated_tool_call_healed():
    """A tool call cut off by the token limit still parses via partial-JSON
    healing (≡ json-partial.cpp)."""
    from tpullm.chat import parse_tool_calls

    text = 'Checking.\n<tool_call>{"name": "get_weather", "arguments": {"city": "Par'
    content, calls = parse_tool_calls(text)
    assert content == "Checking."
    assert calls and calls[0]["function"]["name"] == "get_weather"
    assert "Par" in calls[0]["function"]["arguments"]


def test_builtin_templates_long_tail():
    """Round-trip the newly added builtins against reference-exact strings
    (llama-chat.cpp test vectors, spot-checked)."""
    from tpullm.chat import BUILTIN

    msgs = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "yo"},
        {"role": "user", "content": "again"},
    ]
    # mistral v1: leading+trailing spaces, system folded into the turn
    assert BUILTIN["mistral-v1"](msgs, True) == (
        " [INST] sys\n\nhi [/INST] yo</s> [INST] again [/INST]"
    )
    # v3: no leading space, assistant trimmed
    assert BUILTIN["mistral-v3"](msgs, True) == (
        "[INST] sys\n\nhi[/INST] yo</s>[INST] again[/INST]"
    )
    # v3-tekken: no spaces at all
    assert BUILTIN["mistral-v3-tekken"](msgs, True) == (
        "[INST]sys\n\nhi[/INST]yo</s>[INST]again[/INST]"
    )
    # llama2-sys keeps <<SYS>>; -bos adds <s> between turns
    assert BUILTIN["llama2-sys"](msgs, True) == (
        "[INST] <<SYS>>\nsys\n<</SYS>>\n\nhi [/INST]yo</s>[INST] again [/INST]"
    )
    assert "<s>[INST]" in BUILTIN["llama2-sys-bos"](msgs, True)
    # chatglm3 prefix
    assert BUILTIN["chatglm3"](msgs, True).startswith("[gMASK]sop<|system|>")
    # bailing role upper-casing
    out = BUILTIN["bailing"](msgs, True)
    assert "<role>HUMAN</role>hi" in out and out.endswith("<role>ASSISTANT</role>")
    assert BUILTIN["bailing-think"](msgs, True).endswith("<think>")
    b2 = BUILTIN["bailing2"]([{"role": "user", "content": "q"}], True)
    assert b2.startswith("<role>SYSTEM</role>detailed thinking off<|role_end|>")
    # dots1 / exaone4 / solar-open shapes
    assert BUILTIN["dots1"](msgs, True).endswith("<|response|>")
    assert BUILTIN["exaone4"](msgs, True).endswith("[|assistant|]")
    assert BUILTIN["solar-open"](msgs, True).endswith("<|begin|>assistant")
    assert BUILTIN["pangu-embedded"]([{"role": "user", "content": "q"}], True) == (
        "[unused9]系统：[unused10][unused9]用户：q[unused10][unused9]助手："
    )
    assert BUILTIN["grok-2"](msgs, True).endswith("Assistant:")
    assert "<end_of_utterance>" in BUILTIN["smolvlm"](msgs, True)
    assert "<｜hy_User｜>" in BUILTIN["hunyuan-dense"](msgs, False)
    assert " Пользователь: hi" in BUILTIN["yandex"](msgs, True)


def test_detect_builtin_long_tail():
    from tpullm.chat import detect_builtin

    assert detect_builtin("...' [INST] ' + system_message...[AVAILABLE_TOOLS] [INST]") == "mistral-v1"
    assert detect_builtin('..."[INST]"...[AVAILABLE_TOOLS]...') == "mistral-v3-tekken"
    assert detect_builtin("...[AVAILABLE_TOOLS]...[INST]...") == "mistral-v3"
    assert detect_builtin("[INST] <<SYS>> ...") == "llama2-sys"
    assert detect_builtin("[INST] {{ content.strip() }} <<SYS>>") == "llama2-sys-strip"
    assert detect_builtin("[INST] plain") == "llama2"
    assert detect_builtin("...[gMASK]sop...") == "chatglm3"
    assert detect_builtin("... Ассистент: ...") == "yandex"
    assert detect_builtin("<role>ASSISTANT</role> 'HUMAN'") == "bailing"
    assert detect_builtin('<role>ASSISTANT</role> "HUMAN" <think>') == "bailing-think"
    assert detect_builtin("<role>ASSISTANT</role><role>HUMAN</role><|role_end|>") == "bailing2"
    assert detect_builtin("x<|userprompt|>y<|endofuserprompt|>") == "dots1"
    assert detect_builtin("[|system|][|assistant|][|endofturn|][|tool|]") == "exaone4"
    assert detect_builtin("[|system|][|assistant|][|endofturn|]") == "exaone3"
    assert detect_builtin("<｜hy_Assistant｜><｜hy_place▁holder▁no▁3｜>") == "hunyuan-dense"
    assert detect_builtin("[unused9]系统：[unused10]") == "pangu-embedded"
    assert detect_builtin("<|begin|><|content|><|end|>") == "solar-open"
    assert detect_builtin("<|im_start|>...<end_of_utterance>") == "smolvlm"
