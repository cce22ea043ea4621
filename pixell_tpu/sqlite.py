"""Convenience wrapper over sqlite3 connections (reference pixell/sqlite.py):
a connection object that also exposes its table/column inventory, pretty
printing, backup/attach/derive helpers."""
import sqlite3, contextlib, tempfile, os


class SQL:
	def __init__(self, fname=":memory:", mode="ro"):
		"""Open an sqlite database. mode: ro (default), rw, rwc
		(reference sqlite.SQL)."""
		if isinstance(fname, str):
			try:
				if fname == ":memory:" or fname.startswith("file:") or mode is None:
					self.conn = sqlite3.connect(fname)
				else:
					self.conn = sqlite3.connect("file:%s?mode=%s" % (fname, mode), uri=True)
			except sqlite3.OperationalError as e:
				raise sqlite3.OperationalError(str(e) + " " + fname)
			self.fname = fname
			self.own = True
		elif hasattr(fname, "conn"):
			self.conn = fname.conn
			self.fname = get_fname(self.conn)
			self.own = False
		elif hasattr(fname, "execute"):
			self.conn = fname
			self.fname = get_fname(self.conn)
			self.own = False
		else:
			raise ValueError("SQL.__init__ needs a file name, an SQL object or a connection")
	def execute(self, command, args=[]):
		return self.conn.execute(command, args)
	def executemany(self, command, args=[]):
		return self.conn.executemany(command, args)
	def derive(self, query, tname="result", aname="_src"):
		return derive(self.conn, query, tname=tname, aname=aname)
	def close(self):
		if self.own: self.conn.close()
	def backup(self, other): backup(self, other)
	def attach(self, other, name="other", mode="r"):
		return attach(self, other, name=name, mode=mode)
	def tables(self): return tables(self)
	def columns(self, tname): return columns(self, tname)
	def show(self, table, limit=10): return show(self, table, limit=limit)
	def __repr__(self):
		return info(self, "SQL", extra=["fname='%s'" % self.fname, "own=%d" % self.own])
	def __enter__(self): return self
	def __exit__(self, *args, **kwargs):
		self.close()


def tables(conn):
	return [e[0] for e in conn.execute("SELECT name from sqlite_master WHERE type='table';")]

def columns(conn, tname):
	return [c[1] for c in conn.execute("PRAGMA table_info('%s');" % tname)]

def rows(conn, tname):
	return list(conn.execute("select count(*) from %s" % tname))[0][0]

def info(conn, name="Connection", extra=[]):
	tnames = tables(conn)
	coldescs = ["%s*%d" % (str(columns(conn, t)), rows(conn, t)) for t in tnames]
	tabdescs = ", ".join("%s:%s" % (t, c) for t, c in zip(tnames, coldescs))
	return "%s(%s)" % (name, ", ".join(["tables=[%s]" % tabdescs] + extra))

def show(conn, table, limit=10):
	query = table
	toks = query.split()
	if len(toks) == 1:
		query = "select * from " + toks[0]
	limit_included = "limit" in toks or "LIMIT" in toks
	if not limit_included:
		query += " limit %d" % (limit + 1)
	result = list(conn.execute(query))
	if limit_included: limit = len(result)
	print(format_result(result, limit=limit))

def format_result(result, limit=None):
	if limit is None: limit = len(result)
	if len(result) == 0: return "<empty>"
	trunc = len(result) > limit
	if trunc: result = result[:limit]
	widths = [0 for _ in result[0]]
	for row in result:
		for fi, field in enumerate(row):
			widths[fi] = max(widths[fi], len(str(field)))
	fmt = " ".join("%%%ds" % w for w in widths)
	lines = [fmt % tuple(row) for row in result]
	if trunc: lines.append("...")
	return "\n".join(lines)

def get_fname(conn):
	if isinstance(conn, str): return conn
	row = next(conn.execute("pragma database_list"))
	return row[2]

def backup(source, target):
	if hasattr(source, "conn"): source = source.conn
	if hasattr(target, "conn"): target = target.conn
	source.backup(target)

@contextlib.contextmanager
def attach(conn_base, conn_other, name="other", mode="r"):
	"""Temporarily attach conn_other to conn_base under the given name
	(reference sqlite.attach). Read-only attach copies via a temp file when
	needed."""
	if hasattr(conn_base, "conn"): conn_base = conn_base.conn
	fname = conn_other if isinstance(conn_other, str) else get_fname(
		conn_other.conn if hasattr(conn_other, "conn") else conn_other)
	conn_base.execute("ATTACH DATABASE ? AS %s" % name, (fname,))
	try:
		yield conn_base
	finally:
		conn_base.execute("DETACH DATABASE %s" % name)

def derive(conn, query, tname="result", out_conn=None, aname="_src"):
	"""Create a new table (in a new memory db by default) from a query on
	conn (reference sqlite.derive)."""
	if hasattr(conn, "conn"): conn = conn.conn
	if out_conn is None:
		out = SQL(":memory:", mode=None)
	else:
		out = out_conn if isinstance(out_conn, SQL) else SQL(out_conn)
	src = get_fname(conn)
	if src and src != "":
		out.conn.execute("ATTACH DATABASE ? AS %s" % aname, (src,))
		try:
			out.conn.execute("CREATE TABLE %s AS %s" % (tname, query))
		finally:
			out.conn.execute("DETACH DATABASE %s" % aname)
	else:
		rows_ = list(conn.execute(query))
		if rows_:
			ncol = len(rows_[0])
			out.conn.execute("CREATE TABLE %s (%s)" % (tname,
				",".join("c%d" % i for i in range(ncol))))
			out.conn.executemany("INSERT INTO %s VALUES (%s)" % (tname,
				",".join("?"*ncol)), rows_)
	return out
