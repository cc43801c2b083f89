"""Console ergonomics parity (reference examples/common.cpp:582-952).

Pins the multiline-input protocol table of console_readline — trailing
`\\` continuation, `/` force-end, the --multiline-input reversal — and the
change-only color emission of console_set_color."""

import io

from llama_cpp_q_4_0_tpu.cli.console import Color, Console


def _read(text: str, multiline: bool = False):
    con = Console(use_color=False, multiline_input=multiline)
    return con.read_input(stdin=io.StringIO(text))


def test_plain_line_keeps_newline():
    # buffer 'hi\n' — the reference tokenizes WITH the newline (main.cpp:629)
    assert _read("hi\n") == "hi\n"


def test_bare_enter_is_length_one():
    # empty line passes control back (main.cpp:615-616: length > 1 check)
    assert _read("\n") == "\n"


def test_backslash_continues_default_mode():
    # 'a\' + 'b' -> 'a\nb\n' (common.cpp:929-932: backslash -> newline)
    assert _read("a\\\nb\n") == "a\nb\n"


def test_backslash_chain():
    assert _read("a\\\nb\\\nc\n") == "a\nb\nc\n"


def test_multiline_mode_continues_by_default():
    # --multiline-input: plain lines continue; trailing '\' ENDS (reversal)
    assert _read("a\nb\\\n", multiline=True) == "a\nb\n"


def test_multiline_mode_slash_force_ends():
    # '/' is dropped and ends input in multiline mode (common.cpp:933-941)
    assert _read("a\nb/\n", multiline=True) == "a\nb"


def test_slash_ends_default_mode_too():
    assert _read("a/\n") == "a"


def test_eof_immediately_returns_none():
    assert _read("") is None


def test_lone_slash_is_empty_buffer_not_eof():
    # '/' alone empties the buffer and passes control back
    # (common.cpp:933-941) — it must NOT read as EOF and end the session
    assert _read("/\n") == ""
    assert _read("/\n", multiline=True) == ""


def test_ctrl_d_on_nonempty_line_ends_input_without_newline():
    # cooked stdin returns the typed text with no trailing newline on
    # Ctrl-D: end_of_stream (common.cpp:944-947) — input ends immediately
    # even in --multiline-input mode, and no newline is appended
    assert _read("abc") == "abc"
    assert _read("abc", multiline=True) == "abc"


def test_eof_mid_multiline_terminates():
    # backslash promises another line but EOF arrives: input ends
    assert _read("a\\\n") == "a\n"


def test_color_change_only_emission():
    out = io.StringIO()
    con = Console(use_color=True)
    con.out = out
    con.set_color(Color.PROMPT)
    con.set_color(Color.PROMPT)  # repeated set: no second write
    con.set_color(Color.DEFAULT)
    assert out.getvalue() == Color.PROMPT.value + Color.DEFAULT.value


def test_color_disabled_writes_nothing():
    out = io.StringIO()
    con = Console(use_color=False)
    con.out = out
    con.set_color(Color.ERROR)
    con.cleanup()
    assert out.getvalue() == ""


def test_utf8_passthrough():
    # Python-native unicode replaces getchar32/append_utf8 surrogate logic
    assert _read("héllo 🌍\\\n你好\n") == "héllo 🌍\n你好\n"


def test_cli_flags_exist():
    from llama_cpp_q_4_0_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["-m", "model.bin", "--multiline-input", "--in-prefix", "U: ",
         "--in-suffix", "A: ", "--color"])
    assert args.multiline_input and args.color
    assert args.input_prefix == "U: " and args.input_suffix == "A: "
