package graft.plugins

/** ServiceLoader providers for the built-in format plugins (listed in
  * META-INF/services/graft.plugins.BioReaderProvider). External format
  * packages ship their own provider + services entry and are discovered
  * identically — the reference's entry-point-group mechanism
  * (plugins.py:167-326) re-expressed on the JVM. */
final class OmeTiffProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.OmeTiffReader.plugin
}

final class ZarrProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.ZarrReader.plugin
}

final class ImageIoProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.ImageIoReader.plugin
}

final class ParquetPlaneProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.writers.ParquetPlaneReader.plugin
}

final class NpyProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.NpyReader.plugin
}

final class NpzProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.NpzReader.plugin
}

final class MrcProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.MrcReader.plugin
}

final class TarProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.TarReader.plugin
}

final class AviProvider extends BioReaderProvider {
  override def plugin: PluginEntry = graft.readers.AviReader.plugin
}
