"""CLI sink — output shape of /root/reference/bin/cli.ts:14-42.

The reference fetches a URL (undici); network fetching is out of scope
here (SURVEY.md §2.1 SRC3), so the input is a local HTML file (or
stdin with ``-``). Output mirrors the reference exactly, including its
quirk of entity-decoding the *already decoded* text a second time and
whitespace-collapsing html output.

Usage:
    python -m readabilitysax_spark.cli page.html [text|html] [--url URL]
"""

from __future__ import annotations

import argparse
import html as _html
import sys

from .core.api import process
from .core.jsstr import collapse_ws


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="readability-spark")
    ap.add_argument("file", help="HTML file path, or - for stdin")
    ap.add_argument("format", nargs="?", default="text", choices=["text", "html"])
    ap.add_argument("--url", default=None, help="page URL (next-page/link resolution)")
    args = ap.parse_args(argv)

    try:
        data = sys.stdin.read() if args.file == "-" else open(
            args.file, encoding="utf-8", errors="replace").read()
    except OSError as exc:
        print(f"ERROR: cannot read {args.file}: {exc.strerror}", file=sys.stderr)
        return 1

    settings: dict = {"type": args.format}
    if args.url:
        settings["pageURL"] = args.url
    result = process(data, settings)

    if result.get("error"):
        print("ERROR:", result.get("text"))
        return 1

    print("TITLE:", result["title"])
    print("SCORE:", result["score"])
    if result["nextPage"]:
        print("NEXT PAGE:", result["nextPage"])
    print("LENGTH:", result["textLength"])
    print("")
    if "text" in result:
        # bin/cli.ts:36 double-decodes via decodeHTML5
        sys.stdout.write(_html.unescape(result["text"]) + "\n")
    else:
        sys.stdout.write(collapse_ws(result.get("html", "")) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
