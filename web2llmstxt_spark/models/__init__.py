"""Model-client plane (D5): the reference-shaped AI describe chain."""

from .client import (  # noqa: F401
    DescribeClient,
    OllamaTransport,
    build_describe_prompt,
)
