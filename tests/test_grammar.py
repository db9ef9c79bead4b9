"""GBNF parser + matcher + JSON-schema compiler tests (≡ reference
tests/test-grammar-parser.cpp, test-grammar-integration.cpp,
test-json-schema-to-grammar.cpp)."""

import json

import numpy as np
import pytest

from tpullm.grammar import (
    GBNFError,
    GrammarConstraint,
    GrammarMatcher,
    json_schema_to_gbnf,
    parse_gbnf,
)


def matches(gbnf: str, text: str, complete: bool = True) -> bool:
    m = GrammarMatcher(parse_gbnf(gbnf))
    if not m.accept_text(text):
        return False
    return m.is_complete if complete else True


# -- parser ------------------------------------------------------------------


def test_parse_simple():
    g = parse_gbnf('root ::= "ab"')
    assert g.names[g.root_id] == "root"


def test_parse_missing_root():
    with pytest.raises(GBNFError):
        parse_gbnf('foo ::= "x"')


def test_parse_undefined_rule():
    with pytest.raises(GBNFError):
        parse_gbnf("root ::= bar")


def test_parse_left_recursion_rejected():
    with pytest.raises(GBNFError):
        parse_gbnf('root ::= root "a" | "b"')


def test_comments_and_ws():
    g = parse_gbnf('# header\nroot ::= "a" # trailing\n   \n')
    assert matches('root ::= "a"', "a")


# -- matcher -----------------------------------------------------------------


def test_literal():
    assert matches('root ::= "hello"', "hello")
    assert not matches('root ::= "hello"', "hellx")
    assert not matches('root ::= "hello"', "hell", complete=True)
    assert matches('root ::= "hello"', "hell", complete=False)  # prefix ok


def test_alternation_and_refs():
    g = 'root ::= greet name\ngreet ::= "hi " | "yo "\nname ::= "bob" | "ann"'
    assert matches(g, "hi bob")
    assert matches(g, "yo ann")
    assert not matches(g, "hi zed")


def test_char_class_and_ranges():
    assert matches("root ::= [a-z]+", "abcxyz")
    assert not matches("root ::= [a-z]+", "abcX")
    assert matches('root ::= [^0-9] [0-9]', "a5")


def test_star_plus_question():
    assert matches('root ::= "a"* "b"', "b")
    assert matches('root ::= "a"* "b"', "aaab")
    assert not matches('root ::= "a"+ "b"', "b")
    assert matches('root ::= "a"? "b"', "ab")
    assert matches('root ::= "a"? "b"', "b")


def test_bounded_repetition():
    assert matches('root ::= [0-9]{2,4}', "12")
    assert matches('root ::= [0-9]{2,4}', "1234")
    assert not matches('root ::= [0-9]{2,4}', "1")
    assert not matches('root ::= [0-9]{2,4}', "12345")
    assert matches('root ::= "x"{3}', "xxx")
    assert not matches('root ::= "x"{3}', "xx")


def test_grouping():
    assert matches('root ::= ("ab" | "cd")+', "abcdab")


def test_dot_any():
    assert matches('root ::= "a" . "c"', "abc")
    assert matches('root ::= "a" . "c"', "aXc")


def test_unicode():
    assert matches('root ::= [\\u00e0-\\u00ff]+', "àéû")
    assert matches('root ::= "日本"', "日本")


def test_recursive_grammar_balanced_parens():
    g = 'root ::= expr\nexpr ::= "(" expr ")" | "x"'
    assert matches(g, "x")
    assert matches(g, "((x))")
    assert not matches(g, "((x)")


def test_partial_utf8_across_tokens():
    m = GrammarMatcher(parse_gbnf('root ::= "日本"'))
    raw = "日本".encode("utf-8")
    assert m.accept_bytes(raw[:2])  # mid-codepoint
    assert m.accept_bytes(raw[2:])
    assert m.is_complete


# -- token constraint ----------------------------------------------------------


def test_constraint_masks_and_accepts():
    pieces = [b"a", b"b", b"ab", b"", b"<eos>"]
    c = GrammarConstraint('root ::= "ab"', pieces, eog_ids={4})
    logits = np.zeros(5, dtype=np.float32)
    out = c(logits.copy())
    # allowed now: "a" (prefix), "ab" (full); b/eos not
    assert np.isfinite(out[0]) and np.isfinite(out[2])
    assert not np.isfinite(out[1]) and not np.isfinite(out[4])
    c.accept(0)  # took "a"
    out = c(logits.copy())
    assert np.isfinite(out[1])  # "b" completes
    assert not np.isfinite(out[0])
    c.accept(1)
    out = c(logits.copy())
    assert np.isfinite(out[4])  # grammar complete → EOG allowed


def test_constraint_with_sampler_end_to_end():
    from tpullm.runtime.sampling import Sampler, SamplerParams

    pieces = [b"{", b"}", b'"x"', b":", b"1", b"2", b" ", b"<eos>"]
    gbnf = 'root ::= "{" "\\"x\\"" ":" ("1" | "2") "}"'
    c = GrammarConstraint(gbnf, pieces, eog_ids={7})
    s = Sampler(SamplerParams(temp=0.0), constraint_fn=c, constraint_accept=c.accept)
    rng = np.random.default_rng(3)
    text = b""
    for _ in range(10):
        tok = s.sample(rng.normal(size=8).astype(np.float32))
        if tok == 7:
            break
        s.accept(tok)
        text += pieces[tok]
    assert text in (b'{"x":1}', b'{"x":2}')


# -- json schema ----------------------------------------------------------------


def _valid(schema, value) -> bool:
    gbnf = json_schema_to_gbnf(schema)
    return matches(gbnf, json.dumps(value, ensure_ascii=False))


def test_schema_primitives():
    assert _valid({"type": "boolean"}, True)
    assert _valid({"type": "integer"}, -42)
    assert not _valid({"type": "integer"}, 1.5)
    assert _valid({"type": "number"}, 3.14)
    assert _valid({"type": "string"}, "hi \"there\"")
    assert _valid({"type": "null"}, None)


def test_schema_enum_const():
    s = {"enum": ["red", "green", 3]}
    assert _valid(s, "red") and _valid(s, 3)
    assert not _valid(s, "blue")
    assert _valid({"const": {"a": 1}}, {"a": 1})


def test_schema_object_required_and_optional():
    s = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        "required": ["a"],
        "additionalProperties": False,
    }
    assert _valid(s, {"a": 1})
    assert _valid(s, {"a": 1, "b": "x"})
    assert not _valid(s, {"b": "x"})
    assert not _valid(s, {"a": 1, "c": 2})


def test_schema_array_bounds():
    s = {"type": "array", "items": {"type": "integer"}, "minItems": 1, "maxItems": 3}
    assert not _valid(s, [])
    assert _valid(s, [1])
    assert _valid(s, [1, 2, 3])
    assert not _valid(s, [1, 2, 3, 4])
    assert not _valid(s, ["x"])


def test_schema_anyof_and_ref():
    s = {
        "$defs": {"pt": {"type": "object", "properties": {"x": {"type": "number"}},
                         "required": ["x"], "additionalProperties": False}},
        "anyOf": [{"$ref": "#/$defs/pt"}, {"type": "null"}],
    }
    assert _valid(s, {"x": 1.5})
    assert _valid(s, None)
    assert not _valid(s, {"y": 1})


def test_schema_nested():
    s = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "tags": {"type": "array", "items": {"enum": ["a", "b"]}},
        },
        "required": ["name", "tags"],
        "additionalProperties": False,
    }
    assert _valid(s, {"name": "n", "tags": ["a", "b", "a"]})
    assert not _valid(s, {"name": "n", "tags": ["c"]})


def test_schema_string_length():
    s = {"type": "string", "minLength": 2, "maxLength": 3}
    assert not _valid(s, "a")
    assert _valid(s, "ab")
    assert _valid(s, "abc")
    assert not _valid(s, "abcd")


def test_schema_freeform_value():
    assert _valid({}, {"deep": [1, {"k": None}, "s", true_ := True]})


# -- partial-JSON healing (≡ common/json-partial.cpp) -------------------------


def test_parse_partial_json_complete():
    from tpullm.grammar.json_partial import parse_partial_json

    v, suffix = parse_partial_json('{"a": 1}')
    assert v == {"a": 1} and suffix == ""


@pytest.mark.parametrize("frag,expect", [
    ('{"name": "get_w', {"name": "get_w"}),
    ('{"name": "f", "arguments": {"city": "Par', {"name": "f", "arguments": {"city": "Par"}}),
    ('{"a": [1, 2', {"a": [1, 2]}),
    ('{"a": ', {"a": None}),
    ('{"a": tru', {"a": None}),
    ('{"a": 12.', {"a": None}),
    ('[{"x": 1}, {"y"', [{"x": 1}, {}]),
    ('{', {}),
    ('{"a": 1,', {"a": 1}),
])
def test_parse_partial_json_fragments(frag, expect):
    from tpullm.grammar.json_partial import parse_partial_json

    v, _suffix = parse_partial_json(frag)
    assert v == expect, (frag, v)


def test_parse_partial_json_garbage():
    from tpullm.grammar.json_partial import parse_partial_json

    assert parse_partial_json("not json at all )") == (None, "")
    assert parse_partial_json("") == (None, "")


# -- lazy triggers (≡ llama_sampler_init_grammar_lazy_patterns) ---------------


def test_lazy_constraint_word_trigger():
    from tpullm.grammar import LazyGrammarConstraint

    pieces = [b"hi ", b"<call>", b"a", b"b", b"<eos>", b"<ca", b"ll>"]
    c = LazyGrammarConstraint(
        'root ::= "<call>" "ab"', pieces, eog_ids={4},
        trigger_patterns=[r"[\s\S]*?(<call>)"],
    )
    logits = np.zeros(7, dtype=np.float32)
    # inactive: everything allowed, logits untouched
    out = c(logits.copy())
    assert np.isfinite(out).all()
    c.accept(0)  # plain prose does not trigger
    assert not c.active
    # trigger split across two tokens still fires on completion
    c.accept(5)
    assert not c.active
    c.accept(6)
    assert c.active
    out = c(logits.copy())
    assert np.isfinite(out[2])  # "a" continues the grammar
    assert not np.isfinite(out[3]) and not np.isfinite(out[4])
    c.accept(2)
    c.accept(3)
    out = c(logits.copy())
    assert np.isfinite(out[4])  # complete → EOG


def test_lazy_constraint_token_trigger():
    from tpullm.grammar import LazyGrammarConstraint

    pieces = [b"x", b"<call>", b"a", b"b", b"<eos>"]
    c = LazyGrammarConstraint(
        'root ::= "<call>" "ab"', pieces, eog_ids={4},
        trigger_tokens=[1],
    )
    c.accept(0)
    assert not c.active
    c.accept(1)  # the trigger token itself is fed to the grammar
    assert c.active
    out = c(np.zeros(5, dtype=np.float32))
    assert np.isfinite(out[2]) and not np.isfinite(out[3])
