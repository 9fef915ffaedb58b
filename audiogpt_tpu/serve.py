"""``python -m audiogpt_tpu.serve`` — launch the chat app (see app.py)."""

from audiogpt_tpu.app import main

if __name__ == "__main__":
    main()
