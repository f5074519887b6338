#!/usr/bin/env python3
"""Subscribe to the modulator's event PUB socket and print events
(port of doc/receive_events.py)."""
import json
import sys

import zmq


def main():
    endpoint = sys.argv[1] if len(sys.argv) > 1 else "tcp://127.0.0.1:5556"
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.connect(endpoint)
    print(f"listening on {endpoint}")
    while True:
        parts = sub.recv_multipart()
        name = parts[0].decode()
        detail = json.loads(parts[1]) if len(parts) > 1 else {}
        print(f"[{name}] {detail}")


if __name__ == "__main__":
    main()
