"""3D GLS Navier-Stokes application (reference:
applications/gls_navier_stokes_3d — SURVEY.md §2.3)."""

from .common import run_app


def main(argv=None) -> int:
    return run_app(3, argv)


if __name__ == "__main__":
    raise SystemExit(main())
