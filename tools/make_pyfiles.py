"""Package pdf_parser_spark into a zip for spark-submit --py-files.

Usage: python tools/make_pyfiles.py [out.zip]
Then:  spark-submit --py-files out.zip your_job.py
"""
import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def main(out="pdf_parser_spark.zip"):
    out_path = REPO / out
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "pdf_parser_spark").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
