"""Chat templating (≡ reference src/llama-chat.cpp builtin templates +
common/jinja engine for GGUF-embedded Jinja templates).

Uses jinja2 when the model embeds a template (tokenizer.chat_template);
otherwise falls back to detected builtin formats.
"""

from __future__ import annotations

from typing import Sequence

Message = dict  # {"role": str, "content": str}


def _render_chatml(messages: Sequence[Message], add_generation_prompt: bool) -> str:
    out = []
    for m in messages:
        out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_generation_prompt:
        out.append("<|im_start|>assistant\n")
    return "".join(out)


def _render_llama2(messages: Sequence[Message], add_generation_prompt: bool) -> str:
    out = []
    system = ""
    for m in messages:
        if m["role"] == "system":
            system = m["content"]
        elif m["role"] == "user":
            content = m["content"]
            if system:
                content = f"<<SYS>>\n{system}\n<</SYS>>\n\n" + content
                system = ""
            out.append(f"[INST] {content} [/INST]")
        else:
            out.append(m["content"])
    return "".join(out)


def _render_llama3(messages: Sequence[Message], add_generation_prompt: bool) -> str:
    out = ["<|begin_of_text|>"]
    for m in messages:
        out.append(
            f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
        )
    if add_generation_prompt:
        out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


BUILTIN = {
    "chatml": _render_chatml,
    "llama2": _render_llama2,
    "llama3": _render_llama3,
}


def detect_builtin(template: str | None) -> str:
    """Template-string → builtin-name detection (≡ llm_chat_detect_template)."""
    if not template:
        return "chatml"
    if "<|im_start|>" in template:
        return "chatml"
    if "<|start_header_id|>" in template:
        return "llama3"
    if "[INST]" in template:
        return "llama2"
    return "chatml"


def apply_chat_template(
    template: str | None,
    messages: Sequence[Message],
    add_generation_prompt: bool = True,
    tools: list | None = None,
    **extra,
) -> str:
    """Render a conversation to the model's prompt format."""
    if template and ("{{" in template or "{%" in template):
        try:
            import jinja2

            env = jinja2.Environment(
                trim_blocks=True, lstrip_blocks=True,
                extensions=["jinja2.ext.loopcontrols"],
            )
            env.globals["raise_exception"] = _raise_exception
            env.filters["tojson"] = _tojson
            tpl = env.from_string(template)
            return tpl.render(
                messages=list(messages),
                add_generation_prompt=add_generation_prompt,
                tools=tools,
                bos_token="", eos_token="",
                **extra,
            )
        except Exception:
            pass  # fall back to builtin detection
    return BUILTIN[detect_builtin(template)](messages, add_generation_prompt)


def _raise_exception(msg):
    raise ValueError(msg)


def _tojson(x, indent=None):
    import json

    return json.dumps(x, indent=indent)
