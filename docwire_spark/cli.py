"""Command-line interface: one document in, extracted output on stdout.

Re-expresses the reference CLI (src/docwire.cpp:165-330; usage
``docwire [options] file_name``, README.md:864-883) for the in-scope
surface: input from a file path or stdin, ``--output_type``
plain_text|html|csv|metadata selecting the exporter
(docwire.cpp:314-328), the standard_filter flags
(docwire.cpp:294-313: min/max_creation_time, max_nodes_number,
folder_name, attachment_extension), and ``--http-post`` forwarding
the output through ``http::post`` with the response becoming the
printed payload (docwire.cpp:171, the chain insertion).  The OCR
options are env-blocked (no OCR engine in this sandbox; the hook
lives in kernel/ocr.py) and the OpenAI/local-AI option family is out
of scope per SURVEY §2.4.

Usage::

    python -m docwire_spark [options] file_name
    cat doc.html | python -m docwire_spark -
"""

from __future__ import annotations

import argparse
import sys

from docwire_spark import __version__

#: --output_type value -> (extract() exports entry, ExtractResult field)
_OUTPUT_TYPES = {
    "plain_text": (None, "text"),
    "html": ("html", "html"),
    "csv": ("csv", "csv"),
    "metadata": ("meta_text", "meta_text"),
}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="docwire_spark",
        description="Extract document content to stdout "
        "(single-document pipeline; use jobs/extract_job.py for "
        "cluster-scale corpora).",
    )
    parser.add_argument(
        "input_file",
        help="path to file to process, or '-' for stdin",
    )
    parser.add_argument(
        "--output_type",
        choices=sorted(_OUTPUT_TYPES),
        default="plain_text",
        help="exporter to render the event stream with "
        "(default: plain_text)",
    )
    parser.add_argument(
        "--http-post",
        metavar="URL",
        help="POST the output to URL and print the response instead",
    )
    parser.add_argument(
        "--mime-type",
        help="pin the input media type (skips content sniffing, "
        "like an HTTP Content-Type header)",
    )
    parser.add_argument(
        "--min_creation_time", type=int,
        help="filter emails by min creation time (unix seconds)",
    )
    parser.add_argument(
        "--max_creation_time", type=int,
        help="filter emails by max creation time (unix seconds)",
    )
    parser.add_argument(
        "--max_nodes_number", type=int,
        help="filter by max number of nodes",
    )
    parser.add_argument(
        "--folder_name", help="filter emails by folder name",
    )
    parser.add_argument(
        "--attachment_extension", help="filter by attachment type",
    )
    parser.add_argument(
        "--version", action="version",
        version=f"docwire_spark {__version__}",
    )
    return parser


def main(argv: list | None = None) -> int:
    from docwire_spark.kernel.api import extract

    args = build_parser().parse_args(argv)

    if args.input_file == "-":
        data = sys.stdin.buffer.read()
        url = ""
    else:
        try:
            with open(args.input_file, "rb") as f:
                data = f.read()
        except OSError as exc:
            print(f"Error: {exc}", file=sys.stderr)
            return 1
        url = args.input_file

    export, out_field = _OUTPUT_TYPES[args.output_type]
    res = extract(
        data,
        url=url,
        exports=(export,) if export else (),
        mail_min_creation_time=args.min_creation_time,
        mail_max_creation_time=args.max_creation_time,
        max_node_number=args.max_nodes_number,
        folder_names=[args.folder_name] if args.folder_name else None,
        attachment_types=(
            [args.attachment_extension]
            if args.attachment_extension else None
        ),
        mime_hint=args.mime_type,
    )
    if res.error is not None:
        print(f"Error: {res.error}", file=sys.stderr)
        return 1
    out = getattr(res, out_field)
    if out is None:
        print(f"Error: no {args.output_type} output produced",
              file=sys.stderr)
        return 1
    if isinstance(out, str):
        out = out.encode()

    if args.http_post:
        from docwire_spark.serve import HttpPost

        out_mime = "text/html" if args.output_type == "html" \
            else "text/csv" if args.output_type == "csv" \
            else "text/plain"
        try:
            out, _ = HttpPost(args.http_post)(out, mime=out_mime)
        except (RuntimeError, OSError) as exc:
            print(f"Error: {exc}", file=sys.stderr)
            return 1

    sys.stdout.buffer.write(out)
    sys.stdout.buffer.flush()
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
