"""In-message command parsing (mirror of reference tests for
commands.py: /attach, /model, /query_model, /profile,
/ignore_document_loading_errors)."""

from dial_rag_tpu.service.commands import (
    Commands,
    commands_to_config_dict,
    process_commands,
)
from dial_rag_tpu.service.messages import Message, Role


def user(content, attachments=None):
    msg = {"role": "user", "content": content}
    if attachments is not None:
        msg["custom_content"] = {
            "attachments": [{"url": u} for u in attachments]
        }
    return Message.model_validate(msg)


def test_attach_command_adds_attachment():
    messages, commands = process_commands(
        [user("look at this\n/attach files/bucket/a.pdf")],
        enable_debug_commands=False,
    )
    assert messages[0].content == "look at this"
    urls = [a.url for a in messages[0].custom_content.attachments]
    assert urls == ["files/bucket/a.pdf"]


def test_attach_appends_to_existing_attachments():
    messages, _ = process_commands(
        [user("q\n/attach files/b/two.pdf", attachments=["files/b/one.pdf"])],
        enable_debug_commands=False,
    )
    urls = [a.url for a in messages[0].custom_content.attachments]
    assert urls == ["files/b/one.pdf", "files/b/two.pdf"]


def test_debug_commands_parsed_when_enabled():
    messages, commands = process_commands(
        [user("what?\n/model gpt-4o\n/query_model gpt-4o-mini\n/profile")],
        enable_debug_commands=True,
    )
    assert messages[0].content == "what?"
    assert commands.debug.model == "gpt-4o"
    assert commands.debug.query_model == "gpt-4o-mini"
    assert commands.debug.profile is True


def test_debug_commands_stripped_but_ignored_when_disabled():
    """Commands are removed from the text either way, but the parsed
    values are dropped when debug commands are disabled (reference
    commands.py:138-149)."""
    messages, commands = process_commands(
        [user("q\n/model gpt-4o")], enable_debug_commands=False
    )
    assert messages[0].content == "q"
    assert commands.debug.model is None


def test_ignore_errors_command_is_not_debug():
    _, commands = process_commands(
        [user("q\n/ignore_document_loading_errors")],
        enable_debug_commands=False,
    )
    assert commands.conf.ignore_document_loading_errors is True


def test_commands_with_crlf_and_tab_whitespace():
    """Clients send CRLF content and tab-separated args; any whitespace
    must terminate the command name (a trailing \\r must not turn
    /profile into message text)."""
    messages, commands = process_commands(
        [user("q\r\n/profile\r\n/attach\tfiles/b/t.pdf\r\n/model\tgpt-4o\r")],
        enable_debug_commands=True,
    )
    assert commands.debug.profile is True
    assert commands.debug.model == "gpt-4o"
    urls = [a.url for a in messages[0].custom_content.attachments]
    assert urls == ["files/b/t.pdf"]
    assert messages[0].content == "q\r"


def test_leading_space_after_slash_is_not_a_command():
    messages, commands = process_commands(
        [user("/ model gpt-4o")], enable_debug_commands=True
    )
    assert messages[0].content == "/ model gpt-4o"
    assert commands.debug.model is None


def test_non_command_text_untouched():
    original = user("no commands here\njust text")
    messages, _ = process_commands([original], enable_debug_commands=True)
    assert messages[0] is original  # unchanged message is not copied


def test_assistant_messages_not_processed():
    msg = Message.model_validate(
        {"role": "assistant", "content": "/model evil"}
    )
    messages, commands = process_commands([msg], enable_debug_commands=True)
    assert messages[0].content == "/model evil"
    assert commands.debug.model is None


def test_commands_to_config_dict_paths():
    commands = Commands()
    commands.debug.model = "m1"
    commands.debug.query_model = "m2"
    commands.debug.profile = True
    commands.conf.ignore_document_loading_errors = True
    config = commands_to_config_dict(commands)
    assert (
        config["qa_chain"]["chat_chain"]["llm"]["deployment_name"] == "m1"
    )
    assert (
        config["qa_chain"]["query_chain"]["llm"]["deployment_name"] == "m2"
    )
    assert config["use_profiler"] is True
    assert config["ignore_document_loading_errors"] is True


def test_empty_commands_to_empty_config():
    assert commands_to_config_dict(Commands()) == {}
