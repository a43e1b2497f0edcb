"""``python -m nldsc_tpu`` — CLI entry (reference ran ``python nldsc``)."""

from .cli import main

if __name__ == "__main__":
    main()
