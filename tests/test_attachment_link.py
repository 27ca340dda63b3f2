"""Attachment link resolution (mirror of reference test_attachment_link.py)."""

import pytest

from dial_rag_tpu.errors import InvalidAttachmentError
from dial_rag_tpu.service.attachments import (
    AttachmentLink,
    get_attachment_links,
)
from dial_rag_tpu.service.messages import Message


class Ctx:
    """Minimal RequestContext stand-in (duck-typed)."""

    dial_url = "http://dial.example"

    def is_dial_url(self, url: str) -> bool:
        return url.startswith(self.dial_url)

    @property
    def dial_base_url(self):
        return f"{self.dial_url}/v1/"

    @property
    def dial_metadata_base_url(self):
        return f"{self.dial_base_url}metadata/"


def test_relative_dial_link():
    link = AttachmentLink.from_link(Ctx(), "files/bucket123/docs/a.pdf")
    assert link.dial_link == "files/bucket123/docs/a.pdf"
    assert link.absolute_url == (
        "http://dial.example/v1/files/bucket123/docs/a.pdf"
    )
    assert link.display_name == "docs/a.pdf"  # bucket stripped
    assert link.dial_metadata_url == (
        "http://dial.example/v1/metadata/files/bucket123/docs/a.pdf"
    )
    assert link.is_dial_document


def test_absolute_external_url():
    link = AttachmentLink.from_link(Ctx(), "https://other.host/x/report.pdf")
    assert link.absolute_url == "https://other.host/x/report.pdf"
    assert link.display_name == "https://other.host/x/report.pdf"
    assert link.dial_metadata_url is None
    assert not link.is_dial_document


def test_absolute_dial_url_converted_to_relative():
    url = "http://dial.example/v1/files/bkt/sub/doc.pdf"
    link = AttachmentLink.from_link(Ctx(), url)
    assert link.dial_link == "files/bkt/sub/doc.pdf"
    assert link.absolute_url == url
    assert link.display_name == "sub/doc.pdf"


def test_percent_encoded_display_name():
    link = AttachmentLink.from_link(
        Ctx(), "files/bkt/My%20Report%20(v2).pdf"
    )
    assert link.display_name == "My Report (v2).pdf"


def test_not_files_link_rejected():
    with pytest.raises(InvalidAttachmentError):
        AttachmentLink.from_link(Ctx(), "images/bkt/a.png")


def test_missing_bucket_rejected():
    with pytest.raises(InvalidAttachmentError):
        AttachmentLink.from_link(Ctx(), "files/a.pdf")


def test_absolute_path_rejected():
    with pytest.raises(InvalidAttachmentError):
        AttachmentLink.from_link(Ctx(), "/files/bkt/a.pdf")


def test_get_attachment_links_only_user_messages():
    messages = [
        Message.model_validate(
            {
                "role": "user",
                "content": "q",
                "custom_content": {
                    "attachments": [{"url": "files/b/u.pdf"}]
                },
            }
        ),
        Message.model_validate(
            {
                "role": "assistant",
                "content": "a",
                "custom_content": {
                    "attachments": [{"url": "files/b/assistant.pdf"}]
                },
            }
        ),
    ]
    links = list(get_attachment_links(Ctx(), messages))
    assert [str(l) for l in links] == ["files/b/u.pdf"]
