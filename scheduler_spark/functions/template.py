"""Config-template rendering — the engine's jinja analog.

The reference templates its rclone sync config from env vars with
jinja2 StrictUndefined (`template_rclone`,
/root/reference/userCode/lib/utils.py:100-125, template at
userCode/templates/rclone.conf.j2).  This engine's sinks take a
rendered config string the same way; the renderer here covers the
subset the reference's template actually uses — ``{{ VAR }}``
substitution and ``{# ... #}`` comment blocks — with the same
strict-undefined contract (a missing variable FAILS the render instead
of silently emitting an empty endpoint/credential, which is exactly the
failure mode StrictUndefined exists to prevent).

Driver-side, dependency-free, pure string work: config rendering is
job-setup, never a per-row operation, so nothing here touches Spark.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

_COMMENT = re.compile(r"\{#.*?#\}", re.DOTALL)
_VAR = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


class UndefinedTemplateVariable(KeyError):
    """A ``{{ VAR }}`` placeholder had no binding (StrictUndefined)."""


def render_template(template: str, variables: Mapping[str, str]) -> str:
    """Render ``{{ VAR }}`` placeholders from ``variables``; strip
    ``{# ... #}`` comment blocks.  Unknown placeholders raise
    UndefinedTemplateVariable naming the variable."""
    text = _COMMENT.sub("", template)

    def _sub(m: re.Match[str]) -> str:
        name = m.group(1)
        if name not in variables:
            raise UndefinedTemplateVariable(name)
        return str(variables[name])

    return _VAR.sub(_sub, text)


def render_template_from_env(
    template: str,
    required_vars: list[str],
    env: Mapping[str, str],
    test_or_dev: bool = False,
    dev_overrides: Mapping[str, str] | None = None,
) -> str:
    """The full `template_rclone` contract: pull exactly
    ``required_vars`` from ``env`` (missing ⇒ UndefinedTemplateVariable,
    the strict_env analog), then apply ``dev_overrides`` when
    ``test_or_dev`` (the reference forces S3_ADDRESS=localhost under
    RUNNING_AS_TEST_OR_DEV)."""
    missing = [v for v in required_vars if v not in env]
    if missing:
        raise UndefinedTemplateVariable(missing[0])
    bound = {v: env[v] for v in required_vars}
    if test_or_dev and dev_overrides:
        bound.update(dev_overrides)
    return render_template(template, bound)
