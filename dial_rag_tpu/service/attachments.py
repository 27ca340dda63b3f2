"""Attachment link resolution (mirror of reference attachment_link.py):
Dial-relative vs absolute URLs, display names, metadata URLs, and link
extraction from message custom_content."""

from pathlib import PurePosixPath
from typing import Iterator
from urllib.parse import unquote, urljoin, urlparse

from pydantic import BaseModel

from dial_rag_tpu.errors import InvalidAttachmentError
from dial_rag_tpu.service.messages import Message, Role
from dial_rag_tpu.service.request_context import RequestContext


def to_absolute_url(request_context: RequestContext, link: str) -> str:
    return urljoin(request_context.dial_base_url, link, allow_fragments=True)


def to_relative_url(absolute_url: str, base_url: str) -> str:
    parsed_base = urlparse(base_url)
    parsed = urlparse(absolute_url)
    assert parsed.scheme == parsed_base.scheme
    assert parsed.netloc == parsed_base.netloc
    assert parsed.path.startswith(parsed_base.path)
    relative = parsed._replace(
        scheme="",
        netloc="",
        path=str(PurePosixPath(parsed.path).relative_to(parsed_base.path)),
    )
    return relative.geturl()


def to_dial_relative_url(
    request_context: RequestContext, absolute_url: str
) -> str:
    if not request_context.is_dial_url(absolute_url):
        return absolute_url
    return to_relative_url(absolute_url, request_context.dial_base_url)


def to_dial_metadata_url(
    request_context: RequestContext, absolute_url: str, link: str
) -> str | None:
    if not request_context.is_dial_url(absolute_url):
        return None
    return urljoin(
        request_context.dial_metadata_base_url, link, allow_fragments=True
    )


class AttachmentLink(BaseModel):
    """dial_link: the original (possibly relative) URL used to refer to the
    attachment in Dial APIs; absolute_url: for fetching content;
    display_name: user-visible name without the bucket."""

    dial_link: str
    absolute_url: str
    display_name: str
    dial_metadata_url: str | None = None
    type: str | None = None
    reference_url: str | None = None

    def __str__(self) -> str:
        return self.dial_link

    @property
    def is_dial_document(self) -> bool:
        return self.dial_metadata_url is not None

    @staticmethod
    def _get_display_name(link: str) -> str:
        parsed = urlparse(link)
        if parsed.netloc:
            return link
        path = PurePosixPath(parsed.path)
        if path.is_absolute():
            raise InvalidAttachmentError(f"Dial link is not relative: {link}")
        if len(path.parents) < 3:
            raise InvalidAttachmentError(f"Missing bucket in Dial link: {link}")
        if str(path.parents[-2]) != "files":
            raise InvalidAttachmentError(
                f"Dial link is not a link to files: {link}"
            )
        bucket = path.parents[-3]
        relative_path = PurePosixPath(path.relative_to(bucket))
        return str(PurePosixPath(*[unquote(p) for p in relative_path.parts]))

    @classmethod
    def from_link(
        cls,
        request_context: RequestContext,
        link: str,
        type: str | None = None,
        reference_url: str | None = None,
    ) -> "AttachmentLink":
        absolute_url = to_absolute_url(request_context, link)
        if request_context.is_dial_url(absolute_url) and absolute_url == link:
            link = to_dial_relative_url(request_context, absolute_url)
        return cls(
            dial_link=link,
            absolute_url=absolute_url,
            display_name=cls._get_display_name(link),
            dial_metadata_url=to_dial_metadata_url(
                request_context, absolute_url, link
            ),
            type=type,
            reference_url=reference_url,
        )


def get_attachment_links(
    request_context: RequestContext, messages: list[Message]
) -> Iterator[AttachmentLink]:
    for message in messages:
        if message.role != Role.USER:
            continue
        if not message.custom_content or not message.custom_content.attachments:
            continue
        for attachment in message.custom_content.attachments:
            assert attachment.url is not None
            yield AttachmentLink.from_link(
                request_context,
                attachment.url,
                attachment.type,
                attachment.reference_url,
            )
