"""In-message commands: /attach, /model, /query_model, /profile,
/ignore_document_loading_errors (mirror of reference commands.py)."""

from copy import deepcopy
from types import UnionType
from typing import Any, get_args, get_origin

from pydantic import BaseModel

from dial_rag_tpu.service.config import create_update_dict, deep_merge
from dial_rag_tpu.service.messages import (
    CustomContent,
    Message,
    RequestAttachment,
    Role,
)


def parse_primitive_type(type_, value: str) -> Any:
    if type_ is bool:
        return value.lower() in ["true", ""]
    return type_(value)


def consume_line(model: BaseModel, line: str) -> bool:
    for name, field in model.__class__.model_fields.items():
        cmd = f"/{name}"
        if line.startswith(cmd):
            cmd_value = line[len(cmd) :].strip()
            if get_origin(field.annotation) is list:
                element = parse_primitive_type(
                    get_args(field.annotation)[0], cmd_value
                )
                getattr(model, name).append(element)
            elif get_origin(field.annotation) is UnionType:
                arg_type = get_args(field.annotation)[0]
                setattr(model, name, parse_primitive_type(arg_type, cmd_value))
            else:
                setattr(
                    model, name, parse_primitive_type(field.annotation, cmd_value)
                )
            return True
    return False


class DebugCommands(BaseModel):
    profile: bool = False
    model: str | None = None
    query_model: str | None = None


class ConfCommands(BaseModel):
    ignore_document_loading_errors: bool = False


class AttachmentCommands(BaseModel):
    attach: list[str] = []


class Commands(BaseModel):
    debug: DebugCommands = DebugCommands()
    conf: ConfCommands = ConfCommands()


def process_message_commands(message: Message, commands: Commands) -> Message:
    if message.content is None or message.role != Role.USER:
        return message
    if not isinstance(message.content, str):
        # list-of-parts content carries no commands; the request handler
        # rejects it later with the curated 400
        return message

    lines = message.content.split("\n")
    content_lines = []
    attachment_commands = AttachmentCommands()
    consumers = [commands.debug, commands.conf, attachment_commands]

    for line in lines:
        if not any(consume_line(c, line) for c in consumers):
            content_lines.append(line)

    if len(content_lines) == len(lines):
        return message

    new_message = deepcopy(message)
    new_message.content = "\n".join(content_lines)

    if attachment_commands.attach:
        if not new_message.custom_content:
            new_message.custom_content = CustomContent()
        if not new_message.custom_content.attachments:
            new_message.custom_content.attachments = []
        new_message.custom_content.attachments.extend(
            RequestAttachment(type=None, url=url)
            for url in attachment_commands.attach
        )
    return new_message


def commands_to_config_dict(commands: Commands) -> dict[str, Any]:
    # deep_merge, not dict.update: /model and /query_model share the
    # qa_chain subtree and must both survive
    config_dict: dict[str, Any] = {}
    if commands.debug.model:
        config_dict = deep_merge(
            config_dict,
            create_update_dict(
                "qa_chain.chat_chain.llm.deployment_name", commands.debug.model
            ),
        )
    if commands.debug.query_model:
        config_dict = deep_merge(
            config_dict,
            create_update_dict(
                "qa_chain.query_chain.llm.deployment_name",
                commands.debug.query_model,
            ),
        )
    if commands.debug.profile:
        config_dict = deep_merge(
            config_dict, create_update_dict("use_profiler", True)
        )
    if commands.conf.ignore_document_loading_errors:
        config_dict = deep_merge(
            config_dict,
            create_update_dict("ignore_document_loading_errors", True),
        )
    return config_dict


def process_commands(
    messages: list[Message], enable_debug_commands: bool
) -> tuple[list[Message], Commands]:
    commands = Commands()
    result = [process_message_commands(m, commands) for m in messages]
    if not enable_debug_commands:
        commands.debug = DebugCommands()
    return result, commands
