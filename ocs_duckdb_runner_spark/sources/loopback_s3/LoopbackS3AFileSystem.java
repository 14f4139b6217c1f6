/*
 * Minimal read-only Hadoop FileSystem for the s3a:// scheme speaking
 * plain HTTP ranged reads against a path-style object-store endpoint
 * (fs.s3a.endpoint) — the loopback stand-in for hadoop-aws's
 * S3AFileSystem in environments without the AWS SDK jars.
 *
 * This is the engine-side half of the reference's object-store contract
 * (lanl-ocs/ocs-duckdb-runner runner.cc:205-217 session config;
 * runner.cc:56-172 MonitoredFileSystem read accounting): every read is a
 * ranged HTTP GET, and every read increments the scheme's Hadoop
 * FileSystem.Statistics (readOps/bytesRead), which is exactly where the
 * fan-out runner's R11 report reads its totals from
 * (FileSystem.getGlobalStorageStatistics). The protocol subset used —
 * HEAD for the size probe, GET with a bytes= Range header for positioned
 * reads — is the same subset S3AFileSystem needs from S3, so swapping
 * this class for the real connector is a config change only.
 */
package org.ocsspark;

import java.io.EOFException;
import java.io.FileNotFoundException;
import java.io.IOException;
import java.io.InputStream;
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.net.HttpURLConnection;
import java.net.URI;
import java.net.URL;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FSInputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.permission.FsPermission;
import org.apache.hadoop.util.Progressable;

public class LoopbackS3AFileSystem extends FileSystem {
  private URI uri;
  private String endpoint;
  private Path workingDir;

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    super.initialize(name, conf);
    setConf(conf);
    this.uri = URI.create(name.getScheme() + "://" + name.getAuthority());
    String ep = conf.get("fs.s3a.endpoint", "http://127.0.0.1:9000");
    if (!ep.startsWith("http://") && !ep.startsWith("https://")) {
      boolean ssl = conf.getBoolean("fs.s3a.connection.ssl.enabled", false);
      ep = (ssl ? "https://" : "http://") + ep;
    }
    this.endpoint = ep.replaceAll("/+$", "");
    this.workingDir = new Path("/").makeQualified(this.uri, null);
  }

  @Override
  public String getScheme() {
    return "s3a";
  }

  @Override
  public URI getUri() {
    return uri;
  }

  private URL toUrl(Path p, String query) throws IOException {
    Path abs = makeQualified(p);
    URI u = abs.toUri();
    String bucket = u.getAuthority() == null ? "bucket" : u.getAuthority();
    String key = u.getPath() == null ? "/" : u.getPath();
    String q = query == null ? "" : ("?" + query);
    return new URL(endpoint + "/" + bucket + key + q);
  }

  @Override
  public FileStatus getFileStatus(Path f) throws IOException {
    URL u = toUrl(f, null);
    HttpURLConnection c = (HttpURLConnection) u.openConnection();
    c.setRequestMethod("HEAD");
    int code = c.getResponseCode();
    if (code == 404) {
      throw new FileNotFoundException(f.toString());
    }
    if (code != 200) {
      throw new IOException("HEAD " + u + " -> HTTP " + code);
    }
    boolean dir = "true".equals(c.getHeaderField("X-Ocs-Dir"));
    long len = dir ? 0L : c.getContentLengthLong();
    long mtime = c.getLastModified();
    return new FileStatus(
        len, dir, 1, 128L << 20, mtime, makeQualified(f));
  }

  @Override
  public FileStatus[] listStatus(Path f) throws IOException {
    FileStatus st = getFileStatus(f);
    if (st.isFile()) {
      return new FileStatus[] {st};
    }
    URL u = toUrl(f, "list");
    HttpURLConnection c = (HttpURLConnection) u.openConnection();
    int code = c.getResponseCode();
    if (code != 200) {
      throw new IOException("LIST " + u + " -> HTTP " + code);
    }
    List<FileStatus> out = new ArrayList<>();
    try (BufferedReader r =
        new BufferedReader(
            new InputStreamReader(c.getInputStream(), StandardCharsets.UTF_8))) {
      String line;
      while ((line = r.readLine()) != null) {
        if (line.isEmpty()) {
          continue;
        }
        String[] parts = line.split("\t");
        boolean isDir = parts.length > 2 && "d".equals(parts[2]);
        long size = parts.length > 1 ? Long.parseLong(parts[1]) : 0L;
        out.add(
            new FileStatus(
                size, isDir, 1, 128L << 20, 0L,
                makeQualified(new Path(f, parts[0]))));
      }
    }
    return out.toArray(new FileStatus[0]);
  }

  @Override
  public FSDataInputStream open(Path f, int bufferSize) throws IOException {
    FileStatus st = getFileStatus(f);
    if (st.isDirectory()) {
      throw new FileNotFoundException(f + " is a directory");
    }
    // getLongBytes: the knob is commonly set with a size suffix ("256K")
    long readahead =
        getConf().getLongBytes("fs.s3a.readahead.range", 256L * 1024);
    return new FSDataInputStream(
        new HttpIn(toUrl(f, null), st.getLen(), (int) readahead));
  }

  /**
   * Reads as ranged HTTP GETs with forward readahead (the real s3a
   * connector's fs.s3a.readahead.range behavior): each HTTP request
   * fetches at least the readahead window, and subsequent reads inside
   * the window are served from the buffer — the parquet page-read
   * pattern (~KB per call) costs one request per ~window instead of one
   * per call. Statistics count ACTUAL HTTP requests/bytes, mirroring the
   * reference's MonitoredFileSystem (real S3 reads, runner.cc:109-117).
   */
  private class HttpIn extends FSInputStream {
    private final URL url;
    private final long len;
    private final int readahead;
    private long pos = 0;
    private byte[] window = new byte[0];
    private long winStart = 0;

    HttpIn(URL url, long len, int readahead) {
      this.url = url;
      this.len = len;
      this.readahead = Math.max(readahead, 8 * 1024);
    }

    @Override
    public synchronized void seek(long p) throws IOException {
      if (p < 0 || p > len) {
        throw new EOFException("seek " + p + " outside [0," + len + "]");
      }
      pos = p;
    }

    @Override
    public synchronized long getPos() {
      return pos;
    }

    @Override
    public boolean seekToNewSource(long targetPos) {
      return false;
    }

    @Override
    public synchronized int read() throws IOException {
      byte[] b = new byte[1];
      int n = read(b, 0, 1);
      return n == 1 ? (b[0] & 0xff) : -1;
    }

    @Override
    public synchronized int read(byte[] buf, int off, int n) throws IOException {
      if (pos >= len) {
        return -1;
      }
      int got = buffered(pos, buf, off, n);
      if (got > 0) {
        pos += got;
      }
      return got;
    }

    @Override
    public synchronized int read(long position, byte[] buf, int off, int n)
        throws IOException {
      if (position >= len) {
        return -1;
      }
      return buffered(position, buf, off, n);
    }

    /** Serve from the readahead window, refilling it on a miss. */
    private int buffered(long position, byte[] buf, int off, int n)
        throws IOException {
      long winEnd = winStart + window.length;
      if (position < winStart || position >= winEnd) {
        int want = (int) Math.min((long) Math.max(n, readahead), len - position);
        window = fetch(position, want);
        winStart = position;
        winEnd = winStart + window.length;
      }
      int avail = (int) (winEnd - position);
      int give = Math.min(n, avail);
      System.arraycopy(window, (int) (position - winStart), buf, off, give);
      return give;
    }

    private byte[] fetch(long position, int n) throws IOException {
      long last = Math.min(len - 1, position + (long) n - 1);
      HttpURLConnection c = (HttpURLConnection) url.openConnection();
      c.setRequestProperty("Range", "bytes=" + position + "-" + last);
      int code = c.getResponseCode();
      if (code != 206 && code != 200) {
        throw new IOException("GET " + url + " -> HTTP " + code);
      }
      int want = (int) (last - position + 1);
      byte[] out = new byte[want];
      int got = 0;
      try (InputStream in = c.getInputStream()) {
        while (got < want) {
          int r = in.read(out, got, want - got);
          if (r < 0) {
            break;
          }
          got += r;
        }
      }
      if (statistics != null) {
        statistics.incrementBytesRead(got);
        statistics.incrementReadOps(1);
      }
      if (got < want) {
        byte[] trimmed = new byte[got];
        System.arraycopy(out, 0, trimmed, 0, got);
        return trimmed;
      }
      return out;
    }

    @Override
    public void close() {}
  }

  // ---- read-only: mutations are unsupported (the reference never
  // writes through its monitored S3 path either) ----

  @Override
  public FSDataOutputStream create(
      Path f,
      FsPermission permission,
      boolean overwrite,
      int bufferSize,
      short replication,
      long blockSize,
      Progressable progress)
      throws IOException {
    throw new IOException("LoopbackS3AFileSystem is read-only: create " + f);
  }

  @Override
  public FSDataOutputStream append(Path f, int bufferSize, Progressable p)
      throws IOException {
    throw new IOException("LoopbackS3AFileSystem is read-only: append " + f);
  }

  @Override
  public boolean rename(Path src, Path dst) throws IOException {
    throw new IOException("LoopbackS3AFileSystem is read-only: rename " + src);
  }

  @Override
  public boolean delete(Path f, boolean recursive) throws IOException {
    throw new IOException("LoopbackS3AFileSystem is read-only: delete " + f);
  }

  @Override
  public boolean mkdirs(Path f, FsPermission permission) throws IOException {
    throw new IOException("LoopbackS3AFileSystem is read-only: mkdirs " + f);
  }

  @Override
  public void setWorkingDirectory(Path dir) {
    workingDir = makeQualified(dir);
  }

  @Override
  public Path getWorkingDirectory() {
    return workingDir;
  }
}
