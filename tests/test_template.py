"""Config-template rendering (functions/template.py) — the jinja
analog of the reference's `template_rclone`
(/root/reference/userCode/lib/utils.py:100-125)."""

from __future__ import annotations

import pytest

from scheduler_spark.functions.template import (
    UndefinedTemplateVariable,
    render_template,
    render_template_from_env,
)

RCLONE_STYLE = """{#
license header comment
#}
[lakefs]
type = s3
access_key_id = {{ LAKEFS_ACCESS_KEY_ID}}
endpoint = {{ LAKEFS_ENDPOINT_URL }}

[s3]
endpoint = http://{{ S3_ADDRESS }}:{{ S3_PORT }}
"""


def test_renders_vars_and_strips_comment_blocks():
    out = render_template(
        RCLONE_STYLE,
        {
            "LAKEFS_ACCESS_KEY_ID": "k1",
            "LAKEFS_ENDPOINT_URL": "http://lakefs:8000",
            "S3_ADDRESS": "minio",
            "S3_PORT": "9000",
        },
    )
    assert "license header" not in out
    assert "access_key_id = k1" in out
    assert "endpoint = http://minio:9000" in out
    assert "{{" not in out and "{#" not in out


def test_missing_variable_is_strict_undefined():
    with pytest.raises(UndefinedTemplateVariable) as ei:
        render_template("x = {{ MISSING_VAR }}", {})
    assert "MISSING_VAR" in str(ei.value)


def test_env_contract_pulls_only_required_and_applies_dev_override():
    env = {"S3_ADDRESS": "prod-host", "S3_PORT": "9000", "UNRELATED": "x"}
    out = render_template_from_env(
        "addr = {{ S3_ADDRESS }}:{{ S3_PORT }}",
        ["S3_ADDRESS", "S3_PORT"],
        env,
        test_or_dev=True,
        dev_overrides={"S3_ADDRESS": "localhost"},
    )
    assert out == "addr = localhost:9000"
    # without the dev flag the env value passes through untouched
    out2 = render_template_from_env(
        "addr = {{ S3_ADDRESS }}:{{ S3_PORT }}",
        ["S3_ADDRESS", "S3_PORT"],
        env,
        dev_overrides={"S3_ADDRESS": "localhost"},
    )
    assert out2 == "addr = prod-host:9000"


def test_env_contract_fails_on_missing_required_var():
    with pytest.raises(UndefinedTemplateVariable):
        render_template_from_env("{{ A }}", ["A", "B"], {"A": "1"})
