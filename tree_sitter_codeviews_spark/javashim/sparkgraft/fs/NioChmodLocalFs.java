package sparkgraft.fs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.DelegateToFileSystem;

/** AbstractFileSystem binding for file:// backed by the NIO-chmod raw fs. */
public class NioChmodLocalFs extends DelegateToFileSystem {
    public NioChmodLocalFs(final URI theUri, final Configuration conf)
            throws IOException, URISyntaxException {
        super(theUri, new NioChmodRawLocalFileSystem(), conf, "file", false);
    }
}
