"""Build the documentation site from ``docs/*.md`` (reference CI builds a
sphinx+myst site and deploys it to gh-pages,
``/root/reference/.github/workflows/ci.yml:19-39``; this image has no
sphinx, so the site builder is a dependency-free markdown renderer with
the subset the docs use: headings, fenced code, tables, lists, links,
emphasis, inline code, blockquotes).

Usage:
    python tools/docs/build_site.py [--out docs/_site]
"""

from __future__ import annotations

import argparse
import html
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]

_STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       max-width: 60rem; margin: 0 auto; padding: 2rem; line-height: 1.6;
       color: #1a202c; }
nav { border-bottom: 1px solid #e2e8f0; padding-bottom: .75rem;
      margin-bottom: 1.5rem; }
nav a { margin-right: 1rem; color: #2b6cb0; text-decoration: none; }
pre { background: #f7fafc; border: 1px solid #e2e8f0; border-radius: 6px;
      padding: .75rem 1rem; overflow-x: auto; }
code { font-family: ui-monospace, 'SF Mono', Menlo, monospace;
       font-size: .92em; background: #f7fafc; padding: .1em .3em;
       border-radius: 4px; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #cbd5e0; padding: .35rem .7rem; text-align: left; }
th { background: #edf2f7; }
blockquote { border-left: 4px solid #cbd5e0; margin-left: 0;
             padding-left: 1rem; color: #4a5568; }
h1, h2, h3 { line-height: 1.25; }
"""


def _inline(text: str) -> str:
    text = html.escape(text, quote=False)
    text = re.sub(r"`([^`]+)`", r"<code>\1</code>", text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<!\*)\*([^*]+)\*(?!\*)", r"<em>\1</em>", text)
    text = re.sub(
        r"\[([^\]]+)\]\(([^)]+)\)",
        lambda m: '<a href="%s">%s</a>'
        % (re.sub(r"\.md$", ".html", m.group(2)), m.group(1)),
        text,
    )
    return text


def md_to_html(md: str) -> str:
    out, i = [], 0
    lines = md.split("\n")
    in_list = None
    while i < len(lines):
        line = lines[i]

        if line.startswith("```"):
            if in_list:
                out.append(f"</{in_list}>")
                in_list = None
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append(
                "<pre><code>%s</code></pre>"
                % html.escape("\n".join(block), quote=False)
            )
            i += 1
            continue

        if "|" in line and i + 1 < len(lines) and re.match(
            r"^\s*\|?[\s:|-]+\|[\s:|-]*$", lines[i + 1]
        ):
            if in_list:
                out.append(f"</{in_list}>")
                in_list = None
            headers = [c.strip() for c in line.strip().strip("|").split("|")]
            out.append("<table><thead><tr>")
            out.extend(f"<th>{_inline(h)}</th>" for h in headers)
            out.append("</tr></thead><tbody>")
            i += 2
            while i < len(lines) and "|" in lines[i]:
                cells = [
                    c.strip() for c in lines[i].strip().strip("|").split("|")
                ]
                out.append(
                    "<tr>"
                    + "".join(f"<td>{_inline(c)}</td>" for c in cells)
                    + "</tr>"
                )
                i += 1
            out.append("</tbody></table>")
            continue

        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            if in_list:
                out.append(f"</{in_list}>")
                in_list = None
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2))}</h{level}>")
            i += 1
            continue

        m = re.match(r"^(\s*)([-*]|\d+\.)\s+(.*)$", line)
        if m:
            tag = "ol" if m.group(2)[0].isdigit() else "ul"
            if in_list != tag:
                if in_list:
                    out.append(f"</{in_list}>")
                out.append(f"<{tag}>")
                in_list = tag
            out.append(f"<li>{_inline(m.group(3))}</li>")
            i += 1
            continue

        if line.startswith(">"):
            out.append(f"<blockquote>{_inline(line[1:].strip())}</blockquote>")
            i += 1
            continue

        if in_list:
            out.append(f"</{in_list}>")
            in_list = None

        if line.strip():
            out.append(f"<p>{_inline(line)}</p>")
        i += 1

    if in_list:
        out.append(f"</{in_list}>")
    return "\n".join(out)


def build(out_dir: Path):
    pages = sorted((ROOT / "docs" / "pages").glob("*.md"))
    index = ROOT / "docs" / "index.md"
    all_pages = [index] + pages

    nav = "".join(
        f'<a href="{p.stem}.html">{p.stem}</a>'
        for p in all_pages
    )

    out_dir.mkdir(parents=True, exist_ok=True)
    for page in all_pages:
        body = md_to_html(page.read_text())
        title = page.stem
        for line in page.read_text().split("\n"):
            if line.startswith("# "):
                title = line[2:].strip()
                break
        (out_dir / f"{page.stem}.html").write_text(
            "<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>{html.escape(title)}</title>"
            f"<style>{_STYLE}</style></head><body>"
            f"<nav>{nav}</nav>{body}</body></html>"
        )
    print(f"built {len(all_pages)} pages -> {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(ROOT / "docs" / "_site"))
    args = parser.parse_args()
    build(Path(args.out))
