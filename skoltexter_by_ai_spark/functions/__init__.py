"""Column-level helpers: sanitize/number-format, the template
compiler, fence/HTML cleanup chains, and the markdown-lite converter."""
