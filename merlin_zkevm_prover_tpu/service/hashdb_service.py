"""HashDB gRPC service + remote client (reference src/service/hashdb/).

Server exposes the local HashDB over the hashdb.v1 proto surface; the
remote client implements the same facade so the executor can use a local
or remote state DB transparently (HashDBClientFactory role,
reference main_executor.cpp:114).
"""

from __future__ import annotations

import sys
from concurrent import futures
from pathlib import Path
from typing import Optional

import grpc

sys.path.insert(0, str(Path(__file__).parent / "gen"))
import hashdb_pb2  # noqa: E402

from ..hashdb.hashdb import HashDB  # noqa: E402

_SERVICE = "hashdb.v1.HashDBService"


def _fea(msg) -> tuple:
    return (msg.fe0, msg.fe1, msg.fe2, msg.fe3)


def _to_fea(t) -> hashdb_pb2.Fea:
    return hashdb_pb2.Fea(fe0=int(t[0]), fe1=int(t[1]), fe2=int(t[2]),
                          fe3=int(t[3]))


class HashDBServer:
    def __init__(self, hashdb: HashDB, port: int = 50061):
        self.hashdb = hashdb
        self.port = port
        self.server: Optional[grpc.Server] = None

    # -- handlers --
    def _set(self, req, ctx):
        res = self.hashdb.set(req.batch_uuid, req.tx, _fea(req.old_root),
                              _fea(req.key), int(req.value))
        return hashdb_pb2.SetResponse(
            old_root=_to_fea(res.old_root), new_root=_to_fea(res.new_root),
            key=_to_fea(res.key), new_value=str(res.new_value),
            old_value=str(res.old_value), mode=res.mode,
            proof_hash_counter=res.proof_hash_counter,
        )

    def _get(self, req, ctx):
        res = self.hashdb.get(_fea(req.root), _fea(req.key))
        return hashdb_pb2.GetResponse(
            root=_to_fea(res.root), key=_to_fea(res.key),
            value=str(res.value),
            proof_hash_counter=res.proof_hash_counter,
        )

    def _set_program(self, req, ctx):
        self.hashdb.set_program(_fea(req.key), req.data, req.persistent)
        return hashdb_pb2.SetProgramResponse(result=0)

    def _get_program(self, req, ctx):
        data = self.hashdb.get_program(_fea(req.key))
        return hashdb_pb2.GetProgramResponse(
            data=data or b"", result=0 if data is not None else 1
        )

    def _load_db(self, req, ctx):
        nodes = {}
        for k, v in req.input_db.items():
            key = tuple(int(k[i * 16:(i + 1) * 16], 16) for i in range(4))
            nodes[key] = [int(x) for x in v.split(":")]
        self.hashdb.load_db(nodes, req.persistent)
        return hashdb_pb2.Empty()

    def _load_program_db(self, req, ctx):
        programs = {}
        for k, v in req.input_program_db.items():
            key = tuple(int(k[i * 16:(i + 1) * 16], 16) for i in range(4))
            programs[key] = v
        self.hashdb.load_program_db(programs, req.persistent)
        return hashdb_pb2.Empty()

    def _flush(self, req, ctx):
        fid = self.hashdb.flush(req.batch_uuid)
        st = self.hashdb.get_flush_status()
        return hashdb_pb2.FlushResponse(
            flush_id=fid, stored_flush_id=st["stored_flush_id"]
        )

    def _semi_flush(self, req, ctx):
        return hashdb_pb2.Empty()

    def _get_flush_status(self, req, ctx):
        st = self.hashdb.get_flush_status()
        return hashdb_pb2.GetFlushStatusResponse(
            stored_flush_id=st["stored_flush_id"],
            pending_flush_id=st["pending_flush_id"],
        )

    def _purge(self, req, ctx):
        self.hashdb.purge(req.batch_uuid)
        return hashdb_pb2.Empty()

    def start(self):
        handlers = {
            "Set": (self._set, hashdb_pb2.SetRequest,
                    hashdb_pb2.SetResponse),
            "Get": (self._get, hashdb_pb2.GetRequest,
                    hashdb_pb2.GetResponse),
            "SetProgram": (self._set_program, hashdb_pb2.SetProgramRequest,
                           hashdb_pb2.SetProgramResponse),
            "GetProgram": (self._get_program, hashdb_pb2.GetProgramRequest,
                           hashdb_pb2.GetProgramResponse),
            "LoadDB": (self._load_db, hashdb_pb2.LoadDBRequest,
                       hashdb_pb2.Empty),
            "LoadProgramDB": (self._load_program_db,
                              hashdb_pb2.LoadProgramDBRequest,
                              hashdb_pb2.Empty),
            "Flush": (self._flush, hashdb_pb2.FlushRequest,
                      hashdb_pb2.FlushResponse),
            "SemiFlush": (self._semi_flush, hashdb_pb2.SemiFlushRequest,
                          hashdb_pb2.Empty),
            "GetFlushStatus": (self._get_flush_status, hashdb_pb2.Empty,
                               hashdb_pb2.GetFlushStatusResponse),
            "Purge": (self._purge, hashdb_pb2.PurgeRequest,
                      hashdb_pb2.Empty),
        }
        method_handlers = {
            name: grpc.unary_unary_rpc_method_handler(
                fn, request_deserializer=req_t.FromString,
                response_serializer=lambda m: m.SerializeToString(),
            )
            for name, (fn, req_t, _) in handlers.items()
        }
        self.server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
        self.server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, method_handlers),)
        )
        self.port = self.server.add_insecure_port(f"127.0.0.1:{self.port}")
        self.server.start()
        return self.port

    def stop(self):
        if self.server:
            self.server.stop(grace=1)


class HashDBRemote:
    """Client-side facade with the local HashDB surface over gRPC."""

    def __init__(self, target: str):
        self.channel = grpc.insecure_channel(target)

        def rpc(name, req_t, res_t):
            return self.channel.unary_unary(
                f"/{_SERVICE}/{name}",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=res_t.FromString,
            )

        self._set = rpc("Set", hashdb_pb2.SetRequest, hashdb_pb2.SetResponse)
        self._get = rpc("Get", hashdb_pb2.GetRequest, hashdb_pb2.GetResponse)
        self._flush = rpc("Flush", hashdb_pb2.FlushRequest,
                          hashdb_pb2.FlushResponse)
        self._status = rpc("GetFlushStatus", hashdb_pb2.Empty,
                           hashdb_pb2.GetFlushStatusResponse)
        self._set_prog = rpc("SetProgram", hashdb_pb2.SetProgramRequest,
                             hashdb_pb2.SetProgramResponse)
        self._get_prog = rpc("GetProgram", hashdb_pb2.GetProgramRequest,
                             hashdb_pb2.GetProgramResponse)

    def set(self, batch_uuid, tx, old_root, key, value,
            persistence: str = "database"):
        res = self._set(hashdb_pb2.SetRequest(
            old_root=_to_fea(old_root), key=_to_fea(key), value=str(value),
            persistent=True, batch_uuid=batch_uuid, tx=tx,
        ))
        from ..hashdb.smt import SmtSetResult

        out = SmtSetResult()
        out.old_root = _fea(res.old_root)
        out.new_root = _fea(res.new_root)
        out.key = _fea(res.key)
        out.new_value = int(res.new_value)
        out.old_value = int(res.old_value)
        out.mode = res.mode
        return out

    def get(self, root, key):
        res = self._get(hashdb_pb2.GetRequest(root=_to_fea(root),
                                              key=_to_fea(key)))
        from ..hashdb.smt import SmtGetResult

        out = SmtGetResult()
        out.root = _fea(res.root)
        out.key = _fea(res.key)
        out.value = int(res.value)
        return out

    def set_program(self, key, data: bytes, persistent: bool = True):
        self._set_prog(hashdb_pb2.SetProgramRequest(
            key=_to_fea(key), data=data, persistent=persistent,
        ))

    def get_program(self, key):
        res = self._get_prog(hashdb_pb2.GetProgramRequest(key=_to_fea(key)))
        return bytes(res.data) if res.result == 0 else None

    def flush(self, batch_uuid: str = "") -> int:
        return self._flush(
            hashdb_pb2.FlushRequest(batch_uuid=batch_uuid)
        ).flush_id

    def get_flush_status(self):
        st = self._status(hashdb_pb2.Empty())
        return {"stored_flush_id": st.stored_flush_id,
                "pending_flush_id": st.pending_flush_id}


def hashdb_client_factory(config_url: str, hashdb: Optional[HashDB] = None):
    """local -> in-process HashDB; host:port -> gRPC remote (reference
    HashDBClientFactory)."""
    if config_url in ("local", "", None):
        return hashdb or HashDB()
    return HashDBRemote(config_url)
