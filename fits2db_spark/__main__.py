"""``python -m fits2db_spark`` — see cli.py for the argv surface."""

from .cli import main

main()
