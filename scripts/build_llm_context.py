#!/usr/bin/env python
"""Rebuild docs/llm_context.md: all docs pages in one Markdown file.

Mirrors the reference's combined-Markdown-for-LLMs convenience
(/root/reference/docs/llm_context.rst).
"""
import os

ORDER = ["quickstart", "input_reference", "samplers", "output_and_resume",
         "post", "external_likelihoods", "models_api", "cosmology",
         "likelihoods", "grids", "distributed", "performance"]

def main():
    docs = os.path.join(os.path.dirname(__file__), "..", "docs")
    parts = ["# cobaya_tpu — combined documentation for LLM context\n",
             "One concatenated Markdown file of every docs page. "
             "Regenerate with `python scripts/build_llm_context.py`.\n"]
    for name in ORDER:
        with open(os.path.join(docs, name + ".md"), encoding="utf-8") as f:
            parts.append("\n\n---\n\n" + f.read())
    out = os.path.join(docs, "llm_context.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    print("wrote", out)

if __name__ == "__main__":
    main()
