"""Layered app config: env prefix, nested delimiter, YAML file, source
order init > env > yaml (mirror of reference test_app_config.py)."""

from dial_rag_tpu.service.config import (
    AppConfig,
    load_app_config,
    merge_config,
)


def test_env_nested_delimiter(tmp_path):
    config = load_app_config(
        environ={
            "DIAL_RAG__DIAL_URL": "http://core:8080",
            "DIAL_RAG__EMBEDDER__BATCH_SIZE": "64",
            "DIAL_RAG__INDEX_STORAGE__USE_DIAL_FILE_STORAGE": "false",
        }
    )
    assert config.dial_url == "http://core:8080"
    assert config.embedder.batch_size == 64
    assert config.index_storage.use_dial_file_storage is False


def test_bare_alias_env_vars():
    config = load_app_config(
        environ={
            "DIAL_URL": "http://alias:1234",
            "ENABLE_DEBUG_COMMANDS": "true",
        }
    )
    assert config.dial_url == "http://alias:1234"
    assert config.enable_debug_commands is True


def test_yaml_config_file(tmp_path):
    yaml_path = tmp_path / "config.yaml"
    yaml_path.write_text(
        "dial_url: http://from-yaml\n"
        "request:\n  indexing:\n    parser:\n      max_document_text_size: 1024\n"
    )
    config = load_app_config(
        environ={"DIAL_RAG__CONFIG_PATH": str(yaml_path)}
    )
    assert config.dial_url == "http://from-yaml"
    assert config.request.indexing.parser.max_document_text_size == 1024


def test_env_overrides_yaml(tmp_path):
    yaml_path = tmp_path / "config.yaml"
    yaml_path.write_text("dial_url: http://from-yaml\n")
    config = load_app_config(
        environ={
            "DIAL_RAG__CONFIG_PATH": str(yaml_path),
            "DIAL_RAG__DIAL_URL": "http://from-env",
        }
    )
    assert config.dial_url == "http://from-env"


def test_init_overrides_env():
    config = load_app_config(
        environ={"DIAL_RAG__DIAL_URL": "http://from-env"},
        dial_url="http://from-init",
    )
    assert config.dial_url == "http://from-init"


def test_merge_config_deep_override():
    base = AppConfig()
    merged = merge_config(
        base, {"request": {"indexing": {"parser": {"chunk_size": 500}}}}
    )
    assert merged.request.indexing.parser.chunk_size == 500
    # untouched siblings keep defaults
    assert (
        merged.request.indexing.parser.max_document_text_size
        == base.request.indexing.parser.max_document_text_size
    )


def test_frozen_and_extra_forbidden():
    import pydantic
    import pytest

    with pytest.raises(pydantic.ValidationError):
        AppConfig.model_validate({"no_such_field": 1})
    config = AppConfig()
    with pytest.raises(pydantic.ValidationError):
        config.dial_url = "http://mutate"


def test_environment_presets_load_and_validate():
    """Every shipped config/*.yaml preset (the reference's deployment
    environments — reference config/ directory) must validate against
    the AppConfig schema and pick exactly one image-index flavor."""
    import pathlib

    from dial_rag_tpu.ops.metrics import Metric

    preset_dir = pathlib.Path(__file__).parent.parent / "config"
    presets = sorted(preset_dir.glob("*.yaml"))
    assert len(presets) == 8, [p.name for p in presets]
    for path in presets:
        config = load_app_config(
            environ={"DIAL_RAG__CONFIG_PATH": str(path)}
        )
        if path.name == "zero_egress_tuned.yaml":
            # retrieval-only profile (no image-index flavor choice):
            # must carry the measured score-fusion settings (the
            # round-5 expansion winner, eval/tune_word_vectors.py
            # --stage3; both DEV selection rules pick it)
            r = config.request.retrieval
            assert r.fusion_method == "combmnz"
            assert r.fusion_depth == 30
            assert r.ensemble_weights == {
                "semantic": 0.0,
                "late_interaction": 0.5,
                "chargram": 0.5,
            }
            assert r.query_expansion is not None
            assert r.query_expansion.window == 2  # DEV-selected default
            assert config.request.indexing.chargram_index is not None
            continue
        indexing = config.request.indexing
        flavors = [indexing.multimodal_index, indexing.description_index]
        assert sum(f is not None for f in flavors) == 1, path.name
        if indexing.multimodal_index is not None:
            # the metric string must be a real kernel metric
            Metric(indexing.multimodal_index.metric)
        assert config.request.qa_chain.chat_chain.llm.max_prompt_tokens > 0
        assert config.request.qa_chain.query_chain.llm.max_prompt_tokens > 0
