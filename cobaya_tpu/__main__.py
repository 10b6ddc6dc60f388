"""``python -m cobaya_tpu <command>`` dispatcher.

Capability parity with /root/reference/cobaya/__main__.py: run, doc, bib,
install (+ post) subcommands.
"""

import sys


def run_command():
    if len(sys.argv) < 2:
        print("Usage: python -m cobaya_tpu "
              "[run|post|doc|bib|install] ...")
        sys.exit(1)
    command, args = sys.argv[1], sys.argv[2:]
    if command == "run":
        from .run import run_script

        run_script(args)
    elif command == "post":
        from .post import post

        post(args[0])
    elif command == "doc":
        from .doc import doc_script

        doc_script(args)
    elif command == "bib":
        from .bib import bib_script

        bib_script(args)
    elif command == "install":
        from .install import install_script

        install_script(args)
    else:
        print(f"Unknown command '{command}'. "
              "Available: run, post, doc, bib, install")
        sys.exit(1)


if __name__ == "__main__":
    run_command()
