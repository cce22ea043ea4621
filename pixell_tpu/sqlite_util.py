"""sqlite conveniences (reference pixell/sqlite.py)."""
from __future__ import annotations
import sqlite3
import numpy as np


class SQL:
	"""Small convenience wrapper around sqlite3 (reference sqlite.SQL:7)."""
	def __init__(self, fname=":memory:"):
		self.fname = fname
		self.conn = sqlite3.connect(fname)
	def execute(self, *args, **kwargs):
		return self.conn.execute(*args, **kwargs)
	def query(self, q, args=()):
		cur = self.conn.execute(q, args)
		return cur.fetchall()
	def tables(self):
		return [r[0] for r in self.query(
			"select name from sqlite_master where type='table'")]
	def columns(self, table):
		return [r[1] for r in self.query("pragma table_info(%s)" % table)]
	def write_array(self, table, arr, names=None):
		arr = np.asarray(arr)
		if arr.ndim == 1: arr = arr[:, None]
		n = arr.shape[1]
		if names is None: names = ["c%d" % i for i in range(n)]
		self.execute("create table if not exists %s (%s)" % (
			table, ",".join("%s real" % c for c in names)))
		self.conn.executemany("insert into %s values (%s)" % (
			table, ",".join("?"*n)), [tuple(map(float, row)) for row in arr])
		self.conn.commit()
	def read_array(self, table):
		return np.array(self.query("select * from %s" % table))
	def close(self): self.conn.close()
	def __enter__(self): return self
	def __exit__(self, *args): self.close()

def open(fname=":memory:"):
	return SQL(fname)
