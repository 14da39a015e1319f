"""PDF + HTML byte-level text extraction (no third-party PDF libs).

writer.py     deterministic PDF generator for fixtures (real xref,
              content streams, Flate, ToUnicode CMaps, object streams)
tokenizer.py  the extraction engine: object lexer, stream decoding,
              content-stream interpreter, y-sweep line clustering
html_extract.py  main-content extraction via text-density +
              link-density block classification
"""
