package graft.source

/** Byte-transpose (de)shuffle shared by the HDF5 and zarr codec paths
  * (HDF5 filter 2; numcodecs `shuffle`). Trailing bytes past the last
  * whole element copy through unchanged on both directions.
  */
private[source] object ByteShuffle {

  def forward(data: Array[Byte], elem: Int): Array[Byte] = {
    if (elem <= 1) return data
    val n = data.length / elem
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elem) {
      var i = 0
      while (i < n) { out(j * n + i) = data(i * elem + j); i += 1 }
      j += 1
    }
    var t = n * elem
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }

  def reverse(data: Array[Byte], elem: Int): Array[Byte] = {
    if (elem <= 1) return data
    val n = data.length / elem
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elem) {
      var i = 0
      while (i < n) { out(i * elem + j) = data(j * n + i); i += 1 }
      j += 1
    }
    var t = n * elem
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }
}
